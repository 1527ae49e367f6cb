from .ddpm import LayoutDiffusion
from .ldm import ShapeDiffusion
