"""Offline tooling: shadow-parameter preprocessing, color adjustment
(replaces the reference's MATLAB), VGG weight conversion, dataset
download."""
