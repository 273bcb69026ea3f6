"""Pallas TPU kernels for the MNC hot ops."""
