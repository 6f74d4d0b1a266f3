"""Mesh-sharded multi-chip MSM."""

from .sharded import make_mesh, msm_sharded, shard_points
