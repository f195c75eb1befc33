"""Import every kernel module so @register populates the registry."""

from . import ams, bloom, countmin, cuckoo, ddsketch, decay, histograms, hll, kmv, mg, reservoir, wavelet  # noqa: F401
