"""Build-and-cache helpers for the reference C binaries used as golden
oracles in parity tests.  All builds are compiled from the read-only
reference tree into a temp dir; tests skip gracefully if the reference or a
compiler is unavailable."""
import os
import shutil
import subprocess

REF = "/root/reference"
BUILD_DIR = os.environ.get("WENET_REFBIN_DIR", "/tmp/wenet_refbins")
_HERE = os.path.dirname(__file__)


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF, "src")) and shutil.which("gcc") is not None


def _build(name: str, cmd: list) -> str:
    os.makedirs(BUILD_DIR, exist_ok=True)
    out = os.path.join(BUILD_DIR, name)
    if not os.path.exists(out):
        subprocess.run(cmd + ["-o", out], check=True, capture_output=True)
    return out


def ldpc_enc_so() -> str:
    return _build("ldpc_enc.so", [
        "gcc", "-O2", "-fPIC", "-shared",
        os.path.join(REF, "tx", "ldpc_enc.c"), "-I" + os.path.join(REF, "tx"),
    ])


def ldpc_dec_driver() -> str:
    return _build("ldpc_dec_driver", [
        "gcc", "-O2", os.path.join(_HERE, "ref_tools", "ldpc_dec_driver.c"),
        os.path.join(REF, "src", "mpdecode_core.c"),
        os.path.join(REF, "src", "phi0.c"),
        "-I" + os.path.join(REF, "src"), "-lm",
    ])


def fsk_demod() -> str:
    return _build("fsk_demod", [
        "gcc", "-O2",
        os.path.join(REF, "src", "fsk_demod.c"),
        os.path.join(REF, "src", "fsk.c"),
        os.path.join(REF, "src", "kiss_fft.c"),
        os.path.join(REF, "src", "kiss_fftr.c"),
        os.path.join(REF, "src", "modem_stats.c"),
        "-I" + os.path.join(REF, "src"), "-lm",
    ])


def fsk_mod_driver() -> str:
    return _build("fsk_mod_driver", [
        "gcc", "-O2", os.path.join(_HERE, "ref_tools", "fsk_mod_driver.c"),
        os.path.join(REF, "src", "fsk.c"),
        os.path.join(REF, "src", "kiss_fft.c"),
        os.path.join(REF, "src", "kiss_fftr.c"),
        os.path.join(REF, "src", "modem_stats.c"),
        "-I" + os.path.join(REF, "src"), "-lm",
    ])


def wenet_ldpc() -> str:
    return _build("wenet_ldpc", [
        "gcc", "-O2",
        os.path.join(REF, "src", "wenet_ldpc.c"),
        os.path.join(REF, "src", "mpdecode_core.c"),
        os.path.join(REF, "src", "phi0.c"),
        "-I" + os.path.join(REF, "src"), "-lm",
    ])


def drs232_ldpc() -> str:
    return _build("drs232_ldpc", [
        "gcc", "-O2",
        os.path.join(REF, "src", "drs232_ldpc.c"),
        os.path.join(REF, "src", "mpdecode_core.c"),
        os.path.join(REF, "src", "phi0.c"),
        "-I" + os.path.join(REF, "src"), "-lm",
    ])
