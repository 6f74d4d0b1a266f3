"""Pippenger MSM engine and high-level APIs."""

from .adapters import EdwardsAdapter, ProjectiveAdapter
from .api import EdwardsMsm, WeierstrassMsm
from .pippenger import msm_digits, window_size
