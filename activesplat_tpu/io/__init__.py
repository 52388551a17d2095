"""Byte-compatible result writers: params.npz, transforms.json, actions.txt."""

from activesplat_tpu.io.params_io import load_params, save_params  # noqa: F401
