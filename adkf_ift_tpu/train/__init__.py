"""Training/eval engines: jitted mesh-sharded meta step, host loop,
few-shot eval harness with reference-compatible CSVs (SURVEY.md §2.5, §2.7)."""

from adkf_ift_tpu.train.evaluation import (
    DEFAULT_SUPPORT_SIZES,
    TaskSampleEvalResults,
    TaskSampleEvalResultsNumeric,
    eval_model,
    is_valid_numeric_task,
    write_csv_summary,
    write_csv_summary_numeric,
)
from adkf_ift_tpu.train.loop import TrainLoopConfig, episode_stream, train_loop
from adkf_ift_tpu.train.meta import (
    MetaTrainState,
    init_train_state,
    make_meta_train_step,
    make_optimizer,
)

__all__ = [
    "DEFAULT_SUPPORT_SIZES",
    "MetaTrainState",
    "TaskSampleEvalResults",
    "TaskSampleEvalResultsNumeric",
    "TrainLoopConfig",
    "episode_stream",
    "eval_model",
    "init_train_state",
    "is_valid_numeric_task",
    "make_meta_train_step",
    "make_optimizer",
    "train_loop",
    "write_csv_summary",
    "write_csv_summary_numeric",
]
