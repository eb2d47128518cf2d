from .tokenizer import TokenStream, decode_html, tokenize  # noqa: F401
