"""MoleculeNet few-shot transfer experiment (reference MoleculeNet/**):
the PAR-fork benchmark — Hu et al. pretrained-GNN-style encoders (GIN/
GCN/GraphSAGE) over categorical atom/bond features, ADKF-IFT meta-training
on 2-class 10-shot episodes, and the frozen-encoder "Pre-ADKF-IFT"
baseline. RDKit is needed only to parse the raw CSVs."""

from adkf_ift_tpu.moleculenet.encoder import MolNetEncoder, MolNetEncoderConfig
from adkf_ift_tpu.moleculenet.trainer import (
    MolNetADKFConfig,
    episode_outer_loss,
    episode_predict,
)

__all__ = [
    "MolNetADKFConfig",
    "MolNetEncoder",
    "MolNetEncoderConfig",
    "episode_outer_loss",
    "episode_predict",
]
