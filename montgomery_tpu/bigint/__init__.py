"""Pure-Python big-integer oracle layer (ground truth for all fast kernels)."""

from .field import Field, create_field
from .msm import msm, msm_naive
from .twisted_edwards import EdwardsParams, EdwardsPoint, TwistedEdwardsCurve
from .util import MontgomeryParams, mod, montgomery_params
from .weierstrass import (
    AffinePoint,
    CurveParams,
    Endomorphism,
    ProjectivePoint,
    ProjectiveWeierstrass,
    WeierstrassCurve,
)
