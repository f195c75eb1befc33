"""Pure-numpy synopsis kernels (zero Spark imports — unit-testable alone).

The twelve reference synopses (SURVEY.md §2.1) plus the BottomKSampler
extension. Import this package to populate the registry.
"""

from .base import Synopsis, Trait, kinds, make  # noqa: F401

# registration side effects
from . import _register_all  # noqa: F401
