"""ntlink-tpu: a TPU-native long-read scaffolding engine.

From-scratch reimplementation of the capabilities of bcgsc/ntLink with a
JAX/XLA/Pallas compute path (see DESIGN.md). Public entry points:

- ``ntlink_tpu.pipeline``: stage drivers (`scaffold`, `pair`, `gap_fill`, rounds)
- ``ntlink_tpu.cli``: the `ntlink` command line (reference-compatible flags)
- ``ntlink_tpu.sketch``: minimizer sketching (indexlr-equivalent)
"""

__version__ = "0.1.0"
