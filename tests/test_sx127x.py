"""Register-level SX127x/RFM98W driver tests.

Verifies the register programming path against the reference's setup
sequence (tx/radio_wrappers.py:85-211) and the SX1276 datasheet
quantization rules, then closes the loop: a packet transmitted through
the register-configured radio decodes through the full receiver.
"""
import numpy as np

from wenet_tpu.tx import sx127x
from wenet_tpu.tx.radios import RFM98W_IQ
from wenet_tpu.tx.packet_tx import PacketTX


def test_frequency_register_quantization():
    rf = sx127x.RegisterFile()
    lora = sx127x.SX127x(rf)
    lora.set_freq_hz(443.5e6)
    assert abs(rf.carrier_hz() - 443.5e6) < sx127x.FSTEP_HZ
    assert abs(lora.get_freq_hz() - 443.5e6) < sx127x.FSTEP_HZ
    # reference quantization: int(f_MHz * 16384) -> 3 bytes (LoRa.py:267-282)
    frf = int(443.5 * 16384)
    got = (rf.regs[sx127x.REG_FRF_MSB] << 16 |
           rf.regs[sx127x.REG_FRF_MID] << 8 | rf.regs[sx127x.REG_FRF_LSB])
    assert got == frf


def test_deviation_table_and_quantization():
    # radio_wrappers.py:95-104 deviation selection
    assert sx127x.deviation_for_baud(115177) == 71797
    assert sx127x.deviation_for_baud(115200) == 71797
    assert sx127x.deviation_for_baud(9600) == 4800
    assert sx127x.deviation_for_baud(4800) == 2400
    assert sx127x.deviation_for_baud(96000) == 48000
    rf = sx127x.RegisterFile()
    lora = sx127x.SX127x(rf)
    lora.set_deviation_hz(71797)
    # reference writes int(dev/61.03) (radio_wrappers.py:118-122)
    lsbs = (rf.regs[sx127x.REG_FDEV_MSB] << 8) | rf.regs[sx127x.REG_FDEV_LSB]
    assert lsbs == int(71797 / 61.03)
    assert abs(rf.deviation_hz() - 71797) < 2 * sx127x.FSTEP_HZ


def test_power_lut_matches_reference():
    # radio_wrappers.py:124 LUT: 0..2 dBm -> 0x80, then +1/ dB up to 17
    assert sx127x.TX_POWER_LUT[0] == 0x80
    assert sx127x.TX_POWER_LUT[2] == 0x80
    assert sx127x.TX_POWER_LUT[10] == 0x88
    assert sx127x.TX_POWER_LUT[17] == 0x8F
    rf = sx127x.RegisterFile()
    radio = sx127x.RFM98W(tx_power_dbm=10, transport=rf)
    assert radio.start()
    assert rf.regs[sx127x.REG_PA_CONFIG] == 0x88
    assert rf.power_dbm() == 10
    # unknown power defaults to 0x80 (radio_wrappers.py:129-135)
    radio2 = sx127x.RFM98W(tx_power_dbm=99, transport=sx127x.RegisterFile())
    assert radio2.start()
    assert radio2.lora.get_register(sx127x.REG_PA_CONFIG) == 0x80


def test_setup_sequence_and_temperature():
    rf = sx127x.RegisterFile(temperature_c=21.0)
    radio = sx127x.RFM98W(frequency_hz=441.2e6, baudrate=96000, transport=rf)
    assert radio.comms_ok()
    assert radio.start()
    # sleep -> ... -> FSTX -> TX transition order (radio_wrappers.py:106-139)
    assert rf.mode_trace[0] == sx127x.MODE_SLEEP
    assert rf.mode_trace[-2:] == [sx127x.MODE_FSTX, sx127x.MODE_TX]
    assert rf.mode() == sx127x.MODE_TX
    assert rf.continuous_mode()
    assert radio.temperature == 21
    assert abs(rf.carrier_hz() - 441.2e6) < sx127x.FSTEP_HZ
    radio.shutdown()
    assert rf.mode() == sx127x.MODE_SLEEP


def test_comms_failure_detected():
    rf = sx127x.RegisterFile()
    rf.regs[sx127x.REG_VERSION] = 0x00     # dead SPI bus reads zeros
    radio = sx127x.RFM98W(transport=rf)
    assert not radio.comms_ok()
    assert not radio.start()


def test_periodic_reinit_and_register_truth_roundtrip():
    """RFM98W_IQ: registers drive the synthesized tone shift; packets
    decode end-to-end; radio reinits every reinit_count packets."""
    from wenet_tpu.ops import channel, fsk
    from wenet_tpu.rx.pipeline import Receiver

    cfg = fsk.FSKConfig(Fs=96000, Rs=9600)
    chunks = []
    radio = RFM98W_IQ(chunks.append, frequency_hz=443.5e6, mode="v2",
                      cfg=cfg, reinit_count=3)
    # register-derived tone spacing = 2 x quantized deviation: within the
    # synthesizer's 61 Hz-step quantization of baud (here 9521 vs 9600)
    assert abs(radio.shift - cfg.Rs) / cfg.Rs < 0.01
    tx = PacketTX(radio, callsign="VK5QI")
    for _ in range(2):
        radio.transmit_packet(tx.idle_message)
    tx.transmit_text_message("sx127x register path")
    radio.transmit_packet(tx.telemetry_queue.get_nowait())
    for _ in range(4):
        radio.transmit_packet(tx.idle_message)
    assert radio.radio.tx_packet_count == 7
    assert radio.radio.reinit_events == 2          # at packets 3 and 6
    assert radio.radio.lora.get_mode() == sx127x.MODE_TX

    iq = channel.add_awgn(np.concatenate(chunks), 15.0, cfg.Fs, cfg.Rs,
                          rng=np.random.default_rng(2))
    payloads = Receiver(mode="v2", cfg=cfg).decode_iq(iq)
    texts = [p for p in payloads if p[0] == 0x00]
    assert any(b"sx127x register path" in t for t in texts)
