from anomalyclip_tpu.models.clip.tokenizer import ClipTokenizer, tokenize
from anomalyclip_tpu.models.clip.model import (
    CLIPConfig,
    init_clip_params,
    encode_image,
    encode_text,
    text_transformer_on_embeddings,
)
from anomalyclip_tpu.models.clip.convert import (
    load_torch_clip_checkpoint,
    torch_state_dict_to_params,
)

__all__ = [
    "ClipTokenizer",
    "tokenize",
    "CLIPConfig",
    "init_clip_params",
    "encode_image",
    "encode_text",
    "text_transformer_on_embeddings",
    "load_torch_clip_checkpoint",
    "torch_state_dict_to_params",
]
