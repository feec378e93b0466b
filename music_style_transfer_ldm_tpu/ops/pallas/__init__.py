"""Pallas TPU kernels.

Kernels compile natively on TPU and run through the Pallas interpreter on
CPU (tests), selected automatically from the default backend.
"""
