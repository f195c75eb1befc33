"""Import every kernel module so @register populates the registry."""

from . import ams, bloom, countmin, cuckoo, ddsketch, histograms, hll, kmv, reservoir, wavelet  # noqa: F401
