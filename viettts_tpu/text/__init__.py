from viettts_tpu.text.frontend import (
    load_lexicon,
    normalize_text,
    text_to_tokens,
    tokens_to_ids,
)

__all__ = ["normalize_text", "load_lexicon", "text_to_tokens", "tokens_to_ids"]
