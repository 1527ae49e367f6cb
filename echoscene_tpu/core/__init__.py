from .schedules import (
    ddpm_linear_betas,
    ddpm_warmup_betas,
    ldm_linear_betas,
    cosine_betas,
    DiffusionTables,
    make_diffusion_tables,
    ddim_timesteps,
    ddim_tables,
)
from .boxes import (
    angle_to_sincos,
    sincos_to_angle,
    scale_box_params,
    descale_box_params,
    standardize_box_params,
    destandardize_box_params,
    load_box_stats,
)
from .graphbatch import GraphBatch, SceneBatch, ShapeSelection
