"""Per-push time breakdown of the streaming Receiver (VERDICT r2 #4).

Decomposes one steady-state push into its pipeline phases:
  dispatch  — build the padded buffer + queue the demod program (async)
  retire    — block on the small DemodState carry fetch
  fetch     — D2H of soft bits + validity mask + scalar stats
  uw        — host UW correlation/FSM gating (native C when available)
  decode    — candidate gather + LDPC decode dispatch + CRC gate

The pipelined mode overlaps {fetch, uw, decode} of chunk k with the device
executing chunk k+1, so the achievable pp_speedup is
(total)/(dispatch+retire+max(device_exec, host_side)).  Prints JSON.
"""
import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/tools/", 1)[0]
sys.path.insert(0, REPO)


def run(mode="v2", seconds=8.0, chunk_s=2.0, ebno=12.0, input_format="cu8",
        cfg=None):
    from wenet_tpu.core import framing
    from wenet_tpu.ops import channel, fsk, ldpc
    from wenet_tpu.rx import pipeline
    from wenet_tpu.rx.pipeline import Receiver

    cfg = pipeline.MODE_CONFIGS[mode] if cfg is None else cfg
    rng = np.random.default_rng(3)
    n_bits = int(seconds * cfg.Rs)
    pkt = 343 * 8 + 512
    n_packets = max(n_bits // pkt - 1, 1)
    bits = []
    for _ in range(n_packets):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        bits.append(framing.frame_to_bits(
            framing.frame_packet(p, ldpc.encode_bytes, mode=mode), mode))
        bits.append(rng.integers(0, 2, 512).astype(np.uint8))
    stream = np.concatenate(bits)
    stream = np.concatenate(
        [stream, np.zeros((-len(stream)) % cfg.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(cfg, stream, 2 * cfg.Rs, cfg.Rs)
    iq = channel.add_awgn(sig.astype(np.complex64), ebno, cfg.Fs, cfg.Rs,
                          rng=rng)
    iq = iq / (np.abs(iq).max() + 1e-9)
    raw = fsk.iq_to_cu8(iq) if input_format == "cu8" else iq
    chunk = (2 if input_format == "cu8" else 1) * int(cfg.Fs * chunk_s)

    rx = Receiver(mode=mode, with_eye=False, input_format=input_format,
                  cfg=cfg)
    # warm/compile pass
    for i in range(0, len(raw), chunk):
        rx.push(raw[i:i + chunk])

    from wenet_tpu.ops import deframe
    rx = Receiver(mode=mode, with_eye=False, input_format=input_format,
                  cfg=cfg)
    acc = {k: 0.0 for k in
           ("dispatch", "retire", "fetch", "uw", "decode", "exec_wait")}
    pushes = 0
    payloads = []
    for i in range(0, len(raw), chunk):
        t0 = time.perf_counter()
        inflight = rx._dispatch(raw[i:i + chunk])
        t1 = time.perf_counter()
        if inflight is None:
            continue
        final, packed, eye, buf, n_new = inflight
        # device execution wait: block on the outputs before touching them
        packed.block_until_ready()
        t2 = time.perf_counter()
        rx._retire_state(final, buf)
        t3 = time.perf_counter()
        packed_h = np.asarray(packed)
        valid_h = packed_h[:, -2] > 0.5
        soft_h = packed_h[:, :-2][valid_h].reshape(-1)
        t4 = time.perf_counter()
        d = rx.deframer
        hard = np.concatenate(
            [(d._buf < 0).astype(np.uint8), (soft_h < 0).astype(np.uint8)])
        buf_soft = np.concatenate([d._buf, soft_h.astype(np.float32)])
        positions, stale = deframe.uw_detect_positions(hard, mode, d._state)
        t5 = time.perf_counter()
        pkts, ok, _ = deframe.decode_candidates(buf_soft, positions, mode,
                                                d.max_iter)
        t6 = time.perf_counter()
        payloads += [pkts[j, :256].tobytes()
                     for j in range(len(positions)) if ok[j]]
        # mirror StreamDeframer state carry so the loop stays exact
        d._buf = buf_soft
        d._state = d._state
        if len(positions):
            cut = int(positions[-1]) + d._syms + 1
            d._buf = d._buf[cut:]
            d._state = stale
        elif len(d._buf) > d._syms + d._nuw:
            hb = (d._buf < 0).astype(np.uint8)
            cut = len(d._buf) - d._syms - d._nuw
            d._state = hb[cut - d._nuw:cut].astype(np.int8) \
                if cut >= d._nuw else d._state
            d._buf = d._buf[cut:]
        acc["dispatch"] += t1 - t0
        acc["exec_wait"] += t2 - t1
        acc["retire"] += t3 - t2
        acc["fetch"] += t4 - t3
        acc["uw"] += t5 - t4
        acc["decode"] += t6 - t5
        pushes += 1

    total = sum(acc.values())
    host_side = acc["fetch"] + acc["uw"] + acc["decode"]
    serial_floor = acc["dispatch"] + acc["retire"] + max(
        acc["exec_wait"], host_side)
    out = {"mode": mode, "input_format": input_format, "pushes": pushes,
           "packets_ok": len(payloads), "packets_sent": n_packets,
           "per_push_ms": {k: round(v / max(pushes, 1) * 1e3, 2)
                           for k, v in acc.items()},
           "total_s": round(total, 3),
           "pp_speedup_bound": round(total / max(serial_floor, 1e-9), 2)}
    return out


if __name__ == "__main__":
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    print(json.dumps(run(*(sys.argv[1:2] or ["v2"]))))
