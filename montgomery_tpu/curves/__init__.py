"""Vectorized curve arithmetic over limb planes."""

from .affine import AffineOps
from .edwards import EdwardsBatch, EdwardsOps
from .projective import AffineBatch, ProjectiveBatch, ProjectiveOps
