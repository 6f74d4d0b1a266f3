"""Scalar pipeline: window slicing, GLV decomposition (host oracle + device)."""

from .device import (
    bytes_to_limbs_np,
    decompose_device,
    digits_glv_device,
    glv_device,
    ints_to_limbs_np,
    signed_digits_device,
)
from .glv import GlvParams, decompose, egcd_stop_early, glv_params
from .slicing import num_windows, signed_digits, unsigned_digits
