"""Standing accuracy-evaluation suite (synthetic scenes + ADD-S AUC harness)."""
