"""Pallas/Mosaic TPU kernels — the native-kernel layer (SURVEY.md §2a).

These are the TPU analogues of the reference's AVX2 kernels: fused
dequant+matmul consuming packed K-quant planes / fp8 blocks straight from
HBM (no dequantized weights ever materialize in HBM), and a scalar-prefetch
expert-gather variant for MoE decode.
"""
