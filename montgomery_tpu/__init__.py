"""montgomery_tpu — a TPU-native multi-scalar multiplication (MSM) framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference Wasm library mitschabaude/montgomery (ZPrize '22/'23): Montgomery
field arithmetic over int32 limb planes, GLV decomposition, signed-window
Pippenger MSM with batched-affine additions, projective Weierstrass and
twisted-Edwards curves, sharded across TPU meshes via shard_map + collectives.
"""

__version__ = "0.1.0"
