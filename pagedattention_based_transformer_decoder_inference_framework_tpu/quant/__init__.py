from .tensor import QTensor, quantize_per_channel, quantize_per_row, dequantize

__all__ = ["QTensor", "quantize_per_channel", "quantize_per_row", "dequantize"]
