"""Model zoo (reference ``ppsci/arch/__init__.py:19-110`` registry)."""

import copy
from typing import Dict

from paddlescience_tpu.arch.base import Arch  # noqa: F401
from paddlescience_tpu.arch.afno import AFNONet, PrecipNet  # noqa: F401
from paddlescience_tpu.arch.cuboid_transformer import CuboidTransformer, ExtFormerMoECuboid  # noqa: F401
from paddlescience_tpu.arch.cvit import CVit, CVit1D  # noqa: F401
from paddlescience_tpu.arch.deeponet import DeepONet  # noqa: F401
from paddlescience_tpu.arch.embedding_koopman import (  # noqa: F401
    CylinderEmbedding,
    LorenzEmbedding,
    RosslerEmbedding,
)
from paddlescience_tpu.arch.fno import FNONet, TFNO1dNet, TFNO2dNet, TFNO3dNet  # noqa: F401
from paddlescience_tpu.arch.lno import LNO  # noqa: F401
from paddlescience_tpu.arch.model_list import ModelList  # noqa: F401
from paddlescience_tpu.arch.moflow_net import MoFlowNet, MoFlowProp  # noqa: F401
from paddlescience_tpu.arch.dgmr import DGMR, DGMRDiscriminator, DGMRDiscriminators  # noqa: F401
from paddlescience_tpu.arch.nowcasting import NowcastNet  # noqa: F401
from paddlescience_tpu.arch.gan import Discriminator, Generator  # noqa: F401
from paddlescience_tpu.arch.geofno import FNO1d, VelocityDiscriminator, VelocityGenerator  # noqa: F401
from paddlescience_tpu.arch.graph_nets import (  # noqa: F401
    AMGNet,
    CFDGCN,
    CrystalGraphConvNet,
    GraphCastNet,
    MeshGraphNet,
    TGCN,
)
from paddlescience_tpu.arch.phycrnet import PhyCRNet  # noqa: F401
from paddlescience_tpu.arch.phylstm import DeepPhyLSTM  # noqa: F401
from paddlescience_tpu.arch.physx_transformer import PhysformerGPT2  # noqa: F401
from paddlescience_tpu.arch.sfnonet import SFNONet, SphericalConv  # noqa: F401
from paddlescience_tpu.arch.spinn import SPINN  # noqa: F401
from paddlescience_tpu.arch.misc_nets import (  # noqa: F401
    ChipDeepONets,
    Epnn,
    HEDeepONets,
    Transformer,
    USCNN,
)
from paddlescience_tpu.arch.unetex import UNetEx  # noqa: F401
from paddlescience_tpu.arch.unonet import UNONet  # noqa: F401
from paddlescience_tpu.arch.vae import AutoEncoder  # noqa: F401
from paddlescience_tpu.arch.mlp import (  # noqa: F401
    MLP,
    FourierEmbedding,
    ModifiedMLP,
    PeriodEmbedding,
    PirateNet,
    PirateNetBlock,
    RandomWeightFactorization,
    WeightNormLinear,
)

__all__ = [
    "Arch",
    "DeepONet",
    "FNONet",
    "TFNO1dNet",
    "TFNO2dNet",
    "TFNO3dNet",
    "LNO",
    "SPINN",
    "ModelList",
    "LorenzEmbedding",
    "RosslerEmbedding",
    "CylinderEmbedding",
    "PhysformerGPT2",
    "UNetEx",
    "AutoEncoder",
    "Generator",
    "Discriminator",
    "AFNONet",
    "PrecipNet",
    "Epnn",
    "USCNN",
    "HEDeepONets",
    "ChipDeepONets",
    "Transformer",
    "SFNONet",
    "CVit",
    "CVit1D",
    "PhyCRNet",
    "DeepPhyLSTM",
    "UNONet",
    "CrystalGraphConvNet",
    "TGCN",
    "MeshGraphNet",
    "AMGNet",
    "CFDGCN",
    "GraphCastNet",
    "CuboidTransformer",
    "ExtFormerMoECuboid",
    "NowcastNet",
    "DGMR",
    "DGMRDiscriminators",
    "MoFlowNet",
    "MoFlowProp",
    "FNO1d",
    "VelocityGenerator",
    "VelocityDiscriminator",
    "MLP",
    "ModifiedMLP",
    "PirateNet",
    "PirateNetBlock",
    "FourierEmbedding",
    "PeriodEmbedding",
    "RandomWeightFactorization",
    "WeightNormLinear",
    "build_model",
]


def _registry() -> Dict[str, type]:
    import paddlescience_tpu.arch as arch_mod

    return {
        name: obj
        for name, obj in vars(arch_mod).items()
        if isinstance(obj, type) and issubclass(obj, Arch) and obj is not Arch
    }


def build_model(cfg) -> Arch:
    """Build a model from a config dict {"name": <class>, **kwargs}
    (reference arch/__init__.py:112+)."""
    cfg = copy.deepcopy(dict(cfg))
    name = cfg.pop("name")
    reg = _registry()
    if name not in reg:
        raise ValueError(f"unknown arch '{name}', available: {sorted(reg)}")
    return reg[name](**cfg)
