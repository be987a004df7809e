"""Command-line entry points (the start_*.sh / rx process-pipeline layer).

The reference wires rtl_sdr | fsk_demod | wenet_ldpc | rx_ssdv.py in shell
(start_rx.sh:125-150); here each pipeline is one process:

  python -m wenet_tpu rx        — IQ file/stdin -> packets -> images + UDP
  python -m wenet_tpu tx        — transmit test images / canned SSDV to an
                                  IQ file, bit file, or UDP
  python -m wenet_tpu bench     — PER/throughput regression sweep
                                  (benchmarking/test_demod.py equivalent)
  python -m wenet_tpu web       — live web GUI (wenetserver equivalent)
"""
