from .extract import extract_pages, run_extract  # noqa: F401
from .evaluate import evaluate_extraction  # noqa: F401
from .train import train_model  # noqa: F401
