from .convert import convert_dac_params
from .dac_model import DACDecoder, DACEncoder, DACModel, ResidualVQ

__all__ = ["convert_dac_params", "DACDecoder", "DACEncoder", "DACModel", "ResidualVQ"]
