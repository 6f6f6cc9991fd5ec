from .model import DecoderModel, init_params, quantize_params

__all__ = ["DecoderModel", "init_params", "quantize_params"]
