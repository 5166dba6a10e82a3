"""Neural modules: relational GNN, readouts, feature extractors (parity
with fs_mol/modules/, SURVEY.md §2.3), built for static padded graphs."""

from adkf_ift_tpu.modules.encoder import (
    CombinedFeatureConfig,
    CombinedFeatureExtractor,
    GraphFeatureExtractor,
    GraphFeatureExtractorConfig,
)
from adkf_ift_tpu.modules.gnn import GNN, GNNBlock, GNNConfig
from adkf_ift_tpu.modules.readout import (
    CombinedReadout,
    GraphReadoutConfig,
    MLP,
    MultiHeadWeightedReadout,
    UnweightedReadout,
    make_readout,
)

__all__ = [
    "CombinedFeatureConfig",
    "CombinedFeatureExtractor",
    "CombinedReadout",
    "GNN",
    "GNNBlock",
    "GNNConfig",
    "GraphFeatureExtractor",
    "GraphFeatureExtractorConfig",
    "GraphReadoutConfig",
    "MLP",
    "MultiHeadWeightedReadout",
    "UnweightedReadout",
    "make_readout",
]
