"""TrueTrace-TPU: a TPU-native differentiable wavefront path tracer.

Brand-new framework in JAX/XLA/Pallas/pjit with the capabilities of the
reference renderer TrueTrace-Unity-Pathtracer (see /root/repo/SURVEY.md for the
structural analysis of the reference).  Not a port: the compute path is
designed for the TPU vector/matrix units, the XLA compilation model, and
ICI-connected device meshes.

Subpackages
-----------
core       math primitives: octahedral/RGBE codecs, ONB, MIS, AABB ops, RNG
scene      scene IR (pytree-of-arrays), loaders, procedural scenes, cameras
build      BVH2 SAH build, CWBVH (Ylitie) collapse, light BVH (PBRT-4 SAOH),
           refit level-sweeps; optional C++ fast path
kernels    Pallas TPU kernels: CWBVH traversal, compaction, shading hot loops
integrate  wavefront integrator: bounce loop, NEE+MIS, ReSTIR GI, radiance
           cache, accumulation
diff       differentiable rendering: stored-path-replay custom VJPs
dist       device-mesh sharding, tile partitioning, gradient collectives
post       accumulate / tonemap / TAA / bloom / denoisers
"""

__version__ = "0.1.0"

import jax as _jax

# Rendering needs true f32 geometry math: TPU matmuls otherwise default to
# bf16 multiplicands (8-bit mantissa), which quantizes hit distances and
# transforms into visible artifacts (ring patterns on flat surfaces).
# Kernels that deliberately want bf16 opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "float32")
