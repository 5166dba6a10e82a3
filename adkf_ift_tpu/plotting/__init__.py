"""Result collation and plotting (reference fs_mol/plotting/** +
visualize_results/**): collect per-task eval CSVs into per-support-size
summaries, cross-model comparison tables, box plots and walltime charts.
The CSV schema matches the reference's, so either tool reads both."""

from adkf_ift_tpu.plotting.collect import (
    collect_eval_run,
    cross_model_table,
    summarize_by_support_size,
)

__all__ = ["collect_eval_run", "cross_model_table", "summarize_by_support_size"]
