"""Pallas TPU kernels for the hot compute path (SURVEY.md §7.1)."""
