"""adkf_ift_tpu: TPU-native framework for adaptive deep-kernel Gaussian
processes on few-shot molecular property prediction.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of the
ADKF-IFT reference codebase (Wenlin-Chen/ADKF-IFT): the FS-Mol data and
evaluation harness, the deep-kernel GP model zoo (ADKF-IFT, DKT, DKL,
ProtoNet, CNP, multitask GNN, MAML, GP-ST, ...), implicit-function-
theorem meta-learning, and GP-posterior Bayesian optimization — built
for static shapes, compiled inner loops, and SPMD task-parallel meshes.
"""

__version__ = "0.1.0"
