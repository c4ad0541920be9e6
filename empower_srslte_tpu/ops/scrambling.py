"""Gold-sequence scrambling of bits and LLRs.

Capability parity with lib/src/phy/scrambling/scrambling.c: bit XOR on the
TX side, LLR sign flip on the RX side (scrambling.c:35-107 applies the
same sequence as +-1 to float/short/char LLRs). Sequences are precomputed
per (c_init, length) host-side (utils/sequence.py) and closed over as
device constants, matching the reference's per-RNTI pregeneration
(lib/src/phy/phch/pdsch.c:616-632).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils.sequence import gold_sequence


def scramble_bits(bits, c_init: int):
    """TX: bits [..., n] XOR c(n)."""
    n = bits.shape[-1]
    c = jnp.asarray(gold_sequence(c_init, n))
    return jnp.bitwise_xor(bits.astype(jnp.int8), c)


def descramble_llrs(llrs, c_init: int):
    """RX: flip LLR signs where the scrambling bit is 1 (dtype
    preserved — the int8 quantized lane descrambles in int8)."""
    n = llrs.shape[-1]
    c = gold_sequence(c_init, n)
    sign = jnp.asarray((1.0 - 2.0 * c).astype(np.int8)
                       if llrs.dtype == jnp.int8
                       else (1.0 - 2.0 * c).astype(np.float32))
    return llrs * sign
