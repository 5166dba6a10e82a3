"""Command-line entry points (reference L6: fs_mol/*_train.py,
*_test.py, *_walltime.py, baseline_test.py, gpst_test.py, ...).

Each module exposes a `main(argv=None)`; console scripts are registered
in pyproject.toml. Flag surface mirrors the reference CLIs
(cli_utils.py:23-115, test_utils.py:49-162) so invocations port 1:1.
"""
