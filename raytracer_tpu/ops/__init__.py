"""Hand-written TPU kernels (Pallas) for the hot compute paths."""
