"""Device-side CRC16-CCITT for fully-on-device packet verification.

The host CRC (core/framing.py) is authoritative for the app layer; this
version lets Monte-Carlo sweeps CRC-gate packets without leaving the chip:
a 256-entry LUT gather inside a scan over the byte axis, batched over
packets (reference algorithm: drs232_ldpc.c:91-102 / PacketTX.py:95).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.framing import _CRC16_TABLE

_TABLE = jnp.asarray(_CRC16_TABLE.astype(np.int32))


def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 8k) {0,1} -> (..., k) int32 bytes, MSB-first."""
    w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return bits.reshape(*bits.shape[:-1], -1, 8).astype(jnp.int32) @ w


def crc16(data_bytes: jnp.ndarray) -> jnp.ndarray:
    """data_bytes (..., L) int32 in [0,256) -> (...,) int32 CRC16/CCITT-FALSE."""
    # init derived from the data so the scan carry keeps its device-varying
    # type under shard_map
    init = data_bytes[..., 0] * 0 + 0xFFFF

    def step(crc, byte):
        idx = ((crc >> 8) ^ byte) & 0xFF
        return ((crc << 8) & 0xFFFF) ^ jnp.take(_TABLE, idx), None

    crc, _ = jax.lax.scan(step, init, jnp.moveaxis(data_bytes, -1, 0))
    return crc


def packet_crc_ok(codeword_bits: jnp.ndarray) -> jnp.ndarray:
    """codeword_bits (..., >=2064) -> (...,) bool: CRC trailer check over the
    256-byte payload (trailer little-endian, wenet_ldpc.c:236-243)."""
    pbytes = bits_to_bytes(codeword_bits[..., : 258 * 8])
    rx = crc16(pbytes[..., :256])
    tx = pbytes[..., 256] | (pbytes[..., 257] << 8)
    return rx == tx
