from .torch_import import (
    convert_gconv_net, convert_layout_denoiser, convert_shape_denoiser,
    convert_vqvae, convert_echoscene_checkpoint)
