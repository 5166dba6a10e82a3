"""Create fresh-init checkpoints for walltime-only arms.

The adaptation-walltime comparison (benchmarks/walltime_zoo.py, the
reference's adaptation_walltime figure) times the per-episode COMPUTE
(support fit + query prediction); the weight VALUES are irrelevant to
the timing. Zoo training checkpoints are not kept under git
(.gitignore: ~180 MB each), so arms whose training dirs were cleaned
between sessions get an architecture-correct fresh-init checkpoint
here, built CPU-side in seconds instead of re-running TPU training.

Usage: python benchmarks/make_fresh_ckpts.py [PN GNN-MAML ADKT-VGP]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# CPU-pinned: must be set before jax import (CLAUDE.md).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache_cpu")

import jax

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

from adkf_ift_tpu.data.dataset import DataFold, FSMolDataset
from adkf_ift_tpu.data.episodes import EpisodeSpec
from adkf_ift_tpu.train.loop import episode_stream
from adkf_ift_tpu.utils.checkpoints import save_checkpoint

DATA = os.path.join(REPO, ".zoo", "data")
TRAIN_ROOT = os.path.join(REPO, ".zoo", "train")
COMMON = ["--save-dir", "/tmp/ignore", "--features", "gnn+fc",
          "--support_set_size", "32", "--query_set_size", "64"]


def probe_episode():
    dataset = FSMolDataset.from_directory(DATA)
    spec = EpisodeSpec(support_size=32, query_size=64,
                       nodes_per_graph=48, edges_per_graph=(80, 32, 16))
    return next(episode_stream(dataset, DataFold.TRAIN, spec, repeat=True, num_workers=0))


def build(arm, probe):
    rng = jax.random.PRNGKey(0)
    if arm == "PN":
        from adkf_ift_tpu.cli.protonet_train import parse_command_line
        from adkf_ift_tpu.cli.encoder_args import encoder_config_from_args
        from adkf_ift_tpu.models import protonet

        args = parse_command_line([DATA] + COMMON)
        config = protonet.ProtoNetConfig(
            features=encoder_config_from_args(args),
            distance_metric=args.distance_metric,
        )
        return config, protonet.init_params(config, rng, probe.support)
    if arm == "GNN-MAML":
        from adkf_ift_tpu.cli.maml_train import parse_command_line
        from adkf_ift_tpu.cli.encoder_args import encoder_config_from_args
        from adkf_ift_tpu.models import maml

        args = parse_command_line([DATA] + COMMON)
        config = maml.MAMLConfig(
            graph_config=encoder_config_from_args(args).graph_config,
            inner_steps=args.max_num_inner_train_steps,
            outer_loop_rate_scale=args.outer_loop_rate_scale,
            first_order=args.first_order,
            apply_anil=args.apply_anil,
        )
        return config, maml.init_params(config, rng, probe.support)
    if arm == "ADKT-VGP":
        from dataclasses import replace

        from adkf_ift_tpu.cli.adkf_vgp_train import parse_command_line
        from adkf_ift_tpu.cli.encoder_args import encoder_config_from_args
        from adkf_ift_tpu.gp import LBFGSConfig
        from adkf_ift_tpu.models import adkf_vgp

        args = parse_command_line([DATA] + COMMON)
        feats = encoder_config_from_args(args, normalize_output=args.kernel_type == "cossim")
        feats = replace(feats, fc_hidden_dim=1024,
                        fc_out_dim=feats.graph_config.readout_config.output_dim)
        config = adkf_vgp.ADKTVGPModelConfig(
            features=feats, gp_kernel=args.kernel_type, use_ard=args.use_ard,
            use_lengthscale_prior=args.use_lengthscale_prior,
            ignore_grad_correction=args.ignore_grad_correction,
            inner_optimizer=LBFGSConfig(max_iters=args.inner_max_iters),
            support_size=args.support_set_size,
        )
        return config, adkf_vgp.init_encoder_params(config, rng, probe.support)
    raise SystemExit(f"unknown arm {arm}")


def main():
    arms = sys.argv[1:] or ["PN", "GNN-MAML", "ADKT-VGP"]
    probe = probe_episode()
    for arm in arms:
        # OUTSIDE the FSMol_train_* namespace: tools that glob real runs
        # (sorted(...)[-1] pickers like walltime_zoo's fallback or
        # pn_diag) must never silently prefer an untrained checkpoint
        # over a later real one (ADVICE r3 #1); walltime_zoo checks this
        # path explicitly as its LAST resort.
        out = os.path.join(TRAIN_ROOT, arm, "freshinit", "best_validation")
        legacy = os.path.join(TRAIN_ROOT, arm, "FSMol_train_freshinit")
        if os.path.isdir(legacy):
            # os.rename (not shutil.move): move never lands INSIDE an
            # already-existing freshinit/ dir (ADVICE r4 #2); if the
            # destination exists, the legacy dir's best_validation moves
            # to `out` directly.
            if not os.path.isdir(os.path.dirname(out)):
                print(f"{arm}: migrating {legacy} -> {os.path.dirname(out)}")
                os.rename(legacy, os.path.dirname(out))
            elif not os.path.isdir(out) and os.path.isdir(
                os.path.join(legacy, "best_validation")
            ):
                print(f"{arm}: migrating {legacy}/best_validation -> {out}")
                os.rename(os.path.join(legacy, "best_validation"), out)
        if os.path.isdir(out):
            print(f"{arm}: exists {out}")
            continue
        config, params = build(arm, probe)
        os.makedirs(out, exist_ok=True)
        save_checkpoint(out, config, params, step=0)
        print(f"{arm}: wrote fresh-init checkpoint {out}", flush=True)


if __name__ == "__main__":
    main()
