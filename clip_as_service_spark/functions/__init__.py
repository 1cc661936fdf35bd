from .text import clean_text_udf, extract_text_udf, tokenize_udf  # noqa: F401
