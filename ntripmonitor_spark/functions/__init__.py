"""Scalar/vectorized helper functions (CRC, bit IO, epoch math)."""
