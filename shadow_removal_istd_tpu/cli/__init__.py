"""Argparse CLI preserving the reference's public flag surface."""
