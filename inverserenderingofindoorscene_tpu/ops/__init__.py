from inverserenderingofindoorscene_tpu.ops import bilateral, sg_render
from inverserenderingofindoorscene_tpu.ops.bilateral import bilateral_solve
from inverserenderingofindoorscene_tpu.ops.sg_render import render_sg, sg_envmap

__all__ = ["bilateral", "sg_render", "bilateral_solve", "render_sg", "sg_envmap"]
