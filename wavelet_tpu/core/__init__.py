"""Codec math: Haar transform, thresholding, RLE, metrics."""
