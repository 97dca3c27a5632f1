"""Command-line drivers (reference: train.py / inference.py argparse CLIs)."""
