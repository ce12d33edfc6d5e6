from .convert import convert_dac_params
from .dac_model import DACDecoder, DACEncoder, DACModel, ResidualVQ
from .encodec_model import EncodecCodec, EncodecCodecConfig, convert_encodec_params

__all__ = [
    "convert_dac_params",
    "DACDecoder",
    "DACEncoder",
    "DACModel",
    "ResidualVQ",
    "EncodecCodec",
    "EncodecCodecConfig",
    "convert_encodec_params",
]
