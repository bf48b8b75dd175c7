from dpm_solver_tpu.models.adm_unet import (
    ADMClassifier,
    ADMConfig,
    ADMUNet,
    super_res_inputs,
)
from dpm_solver_tpu.models.ddpm_unet import DDPMUNet, DDPMUNetConfig
from dpm_solver_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
from dpm_solver_tpu.models.ncsnpp_convert import params_from_reference
from dpm_solver_tpu.models.ncsnv2 import NCSNv2, NCSNv2Config
from dpm_solver_tpu.models.text_encoder import (
    BERTEmbedder,
    ClassEmbedder,
    FrozenCLIPEmbedder,
    FrozenCLIPImageEmbedder,
    FrozenCLIPTextJointEmbedder,
    SpatialRescaler,
    constant_context_encoder,
    convert_bert_embedder,
)
from dpm_solver_tpu.models.transformer import SpatialTransformer
from dpm_solver_tpu.models.vae import (
    AutoencoderKL,
    VAEConfig,
    VQModel,
    convert_autoencoder_kl,
)
from dpm_solver_tpu.models.wideresnet import WideResNetClassifier

__all__ = [
    "ADMClassifier",
    "ADMConfig",
    "ADMUNet",
    "super_res_inputs",
    "DDPMUNet",
    "DDPMUNetConfig",
    "NCSNpp",
    "NCSNppConfig",
    "NCSNv2",
    "NCSNv2Config",
    "WideResNetClassifier",
    "params_from_reference",
    "AutoencoderKL",
    "VAEConfig",
    "VQModel",
    "convert_autoencoder_kl",
    "BERTEmbedder",
    "ClassEmbedder",
    "FrozenCLIPImageEmbedder",
    "FrozenCLIPTextJointEmbedder",
    "SpatialRescaler",
    "FrozenCLIPEmbedder",
    "SpatialTransformer",
    "constant_context_encoder",
    "convert_bert_embedder",
]
