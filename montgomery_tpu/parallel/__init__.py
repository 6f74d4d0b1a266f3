"""Mesh-sharded multi-chip MSM."""

from .sharded import make_mesh, msm_full_sharded, msm_sharded, shard_points
