from .blocks import timestep_embedding, GroupNorm32, ResBlock, Upsample, Downsample
from .mlp import MLP, MaskedBatchNorm
from .gcn import GraphTripleConv, GraphTripleConvNet
from .attention import CrossAttention, BasicTransformerBlock, SpatialTransformer
from .unet1d import LayoutDenoiser
from .unet3d import ShapeDenoiser
from .vqvae import VQVAE, Encoder3D, Decoder3D, VectorQuantizer
