"""Custom compute ops: weight-only quantization (fused dequant-matmul Pallas
kernels replacing bitsandbytes) and attention kernels."""

from flowspec_tpu.ops.quant import (
    Int4Tensor, Int8Tensor, NF4Tensor, quantize_int4, quantize_int8,
    quantize_nf4, dequantize, qmatmul,
)

__all__ = ["Int4Tensor", "Int8Tensor", "NF4Tensor", "quantize_int4",
           "quantize_int8", "quantize_nf4", "dequantize", "qmatmul"]
