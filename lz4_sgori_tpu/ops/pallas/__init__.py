"""Pallas TPU kernels for the hot codec paths.

The dense-XLA formulations in ``ops/decode.py`` / ``ops/encode.py`` are
portable and power the CPU/test path, but on TPU their arbitrary gathers
lower to a hard ~90M elem/s serial path (measured on v5e). These kernels
re-express the codec against what the hardware actually does fast:
dynamic *sublane* addressing, full-width lane rolls, masked lane reductions,
and one-hot MXU permutations — with no per-lane gathers anywhere.
"""

