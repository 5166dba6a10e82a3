"""Encoder (GNN / readout / combined-features) CLI argument groups —
parity with the reference's argparse plumbing in fs_mol/modules/gnn.py:31-76,
graph_readout.py:31-80, graph_feature_extractor.py:28-40 and the
--features flag of adaptive_dkt.py:30-33."""

from __future__ import annotations

import argparse

from adkf_ift_tpu.modules import (
    CombinedFeatureConfig,
    GNNConfig,
    GraphFeatureExtractorConfig,
    GraphReadoutConfig,
)

FEATURE_CHOICES = [
    "gnn",
    "ecfp",
    "pc-descs",
    "gnn+ecfp",
    "ecfp+fc",
    "pc-descs+fc",
    "gnn+fc",
    "gnn+ecfp+fc",
    "gnn+ecfp+pc-descs+fc",
]


def add_encoder_cli_args(parser: argparse.ArgumentParser) -> None:
    gnn = parser.add_argument_group("GNN")
    gnn.add_argument(
        "--gnn-type",
        type=str,
        default="PNA",
        choices=["PNA", "Plain", "MultiHeadAttention", "MultiAggr"],
    )
    gnn.add_argument("--num-gnn-layers", type=int, default=8)
    gnn.add_argument("--gnn-hidden-dim", type=int, default=128)
    gnn.add_argument("--num-heads", type=int, default=4)
    gnn.add_argument("--per-head-dim", type=int, default=32)
    gnn.add_argument("--intermediate-dim", type=int, default=512)
    gnn.add_argument("--message-function-depth", type=int, default=1)
    gnn.add_argument("--dropout-rate", type=float, default=0.0)
    gnn.add_argument(
        "--mp-impl", type=str, default="xla", choices=["xla", "pallas"],
        help="Message-passing backend: 'pallas' = fused TPU kernel on the "
        "dense-block episode layout (1.76 vs 1.30 outer steps/s on v5e); "
        "requires --encoder-layout dense.",
    )
    gnn.add_argument("--no-block-remat", action="store_true",
                     help="Disable per-GNN-block rematerialization.")
    # Hidden: run the Pallas kernel in interpreter mode (CPU CI/smokes).
    gnn.add_argument("--pallas-interpret", action="store_true", help=argparse.SUPPRESS)

    readout = parser.add_argument_group("Readout")
    readout.add_argument(
        "--readout-type",
        type=str,
        default="combined",
        choices=[
            "combined",
            "sum",
            "min",
            "max",
            "mean",
            "weighted_sum",
            "weighted_mean",
        ],
    )
    readout.add_argument("--readout-use-only-last-timestep", action="store_true")
    readout.add_argument("--readout-dim", type=int, default=512)
    readout.add_argument("--readout-num-heads", type=int, default=12)
    readout.add_argument("--readout-head-dim", type=int, default=64)

    feats = parser.add_argument_group("Features")
    feats.add_argument(
        "--features",
        type=str,
        default="gnn+ecfp+fc",
        choices=FEATURE_CHOICES,
        help="Molecule featurisation to use (adaptive_dkt.py:30-33).",
    )
    feats.add_argument("--fc-out-dim", type=int, default=2048)
    feats.add_argument("--fc-hidden-dim", type=int, default=2048)


def encoder_config_from_args(
    args: argparse.Namespace, normalize_output: bool = False
) -> CombinedFeatureConfig:
    return CombinedFeatureConfig(
        used_features=args.features,
        graph_config=GraphFeatureExtractorConfig(
            gnn_config=GNNConfig(
                type=args.gnn_type,
                num_layers=args.num_gnn_layers,
                hidden_dim=args.gnn_hidden_dim,
                num_heads=args.num_heads,
                per_head_dim=args.per_head_dim,
                intermediate_dim=args.intermediate_dim,
                message_function_depth=args.message_function_depth,
                dropout_rate=args.dropout_rate,
                mp_impl=getattr(args, "mp_impl", "xla"),
                remat_blocks=not getattr(args, "no_block_remat", False),
                pallas_interpret=getattr(args, "pallas_interpret", False),
            ),
            readout_config=GraphReadoutConfig(
                readout_type=args.readout_type,
                use_all_states=not args.readout_use_only_last_timestep,
                num_heads=args.readout_num_heads,
                head_dim=args.readout_head_dim,
                output_dim=args.readout_dim,
            ),
        ),
        fc_out_dim=args.fc_out_dim,
        fc_hidden_dim=args.fc_hidden_dim,
        normalize_output=normalize_output,
    )
