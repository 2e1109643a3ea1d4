"""TPU-native inverse-rendering framework for complex indoor scenes.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lzqsd/InverseRenderingOfIndoorScene (CVPR'20): from a single LDR/HDR indoor
photo, predict per-pixel albedo / normal / roughness / depth (SVBRDF +
geometry) and spatially-varying lighting as 12 spherical-Gaussian lobes per
pixel, via a two-cascade network with a differentiable rendering layer and a
differentiable bilateral-solver refinement.

Design stance (not a port):
  * NHWC layouts, pure-functional flax modules, optax optimizers,
    orbax checkpoints.
  * The numerically hot differentiable SG -> envmap shading integral is a
    fused Pallas TPU kernel family with custom VJPs (pure-jnp
    implementations serve as the correctness anchor and CPU fallback);
    the bilateral splat/blur/slice + PCG solver is an optimized on-device
    XLA program with a custom VJP — measured gather-bound on the scalar
    core, where a Mosaic kernel cannot win (ablation in BASELINE.md).
  * Parallelism is a single jit'd SPMD program over a jax.sharding.Mesh
    (data x tile axes) instead of the reference's single-process
    nn.DataParallel.
"""

__version__ = "0.1.0"

from inverserenderingofindoorscene_tpu import core  # noqa: F401


def __getattr__(name):
    """Lazy subpackage access: `irois.pipeline`, `irois.ops`, ... import on
    first use (keeps `import inverserenderingofindoorscene_tpu` light)."""
    import importlib

    if name in (
        "models", "ops", "losses", "pipeline", "train", "data",
        "parallel", "eval", "utils", "cli",
    ):
        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(name)
