"""Result collation and plotting (reference fs_mol/plotting/** +
visualize_results/**): collect per-task eval CSVs into per-support-size
summaries, cross-model comparison tables, box plots and walltime charts.
The CSV schema matches the reference's, so either tool reads both."""

from adkf_ift_tpu.plotting.collect import (
    collect_eval_run,
    cross_model_table,
    summarize_by_support_size,
)
from adkf_ift_tpu.plotting.figures import (
    aggregate_by_class,
    collate_experiment_results,
    comparison_box_plot,
    expand_values,
    get_aggregates_across_sizes,
    highlight_max_all,
    load_data,
    load_model_results,
    merge_model_results,
    parse_val_pm_err,
    plot_all_assays,
    plot_by_size,
    plot_task_performances_by_id,
    plot_test_run,
    summarize_test_run,
    walltime_plot,
    write_per_size_summaries,
)

__all__ = [
    "collect_eval_run",
    "cross_model_table",
    "summarize_by_support_size",
    "aggregate_by_class",
    "collate_experiment_results",
    "comparison_box_plot",
    "expand_values",
    "get_aggregates_across_sizes",
    "highlight_max_all",
    "load_data",
    "load_model_results",
    "merge_model_results",
    "parse_val_pm_err",
    "plot_all_assays",
    "plot_by_size",
    "plot_task_performances_by_id",
    "plot_test_run",
    "summarize_test_run",
    "walltime_plot",
    "write_per_size_summaries",
]
