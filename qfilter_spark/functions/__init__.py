"""Vectorized column kernels used inside Arrow UDFs (no per-row Python)."""
