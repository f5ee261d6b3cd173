from ptgnn_tpu.sequence.grucopydecoder import (
    DecoderData,
    GruCopyingDecoder,
    GruCopyingDecoderModel,
    TokenizedOutput,
)
from ptgnn_tpu.sequence.luongattention import LuongAttentionModule

__all__ = [
    "DecoderData",
    "GruCopyingDecoder",
    "GruCopyingDecoderModel",
    "TokenizedOutput",
    "LuongAttentionModule",
]
