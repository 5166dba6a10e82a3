"""Model zoo (SURVEY.md §2.5-2.6): ADKF-IFT (flagship), DKT/DKT+, DKL,
ProtoNet, CNP, GP-ST; multitask GNN / MAML / VGP live in sibling modules."""

from adkf_ift_tpu.models import adkf, adkf_vgp, cnp, dkl, dkt, gpst, protonet
from adkf_ift_tpu.models.adkf import ADKFModelConfig, ADKFPrediction
from adkf_ift_tpu.models.adkf_vgp import ADKTVGPModelConfig
from adkf_ift_tpu.models.cnp import CNPConfig
from adkf_ift_tpu.models.dkl import DKLConfig
from adkf_ift_tpu.models.dkt import DKTModelConfig
from adkf_ift_tpu.models.gpst import GPSTConfig
from adkf_ift_tpu.models.protonet import ProtoNetConfig

__all__ = [
    "ADKFModelConfig",
    "ADKFPrediction",
    "ADKTVGPModelConfig",
    "adkf_vgp",
    "CNPConfig",
    "DKLConfig",
    "DKTModelConfig",
    "GPSTConfig",
    "ProtoNetConfig",
    "adkf",
    "cnp",
    "dkl",
    "dkt",
    "gpst",
    "protonet",
]
