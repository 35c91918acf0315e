"""OpenPGP wire-format parity (pipe/file.go:384-437): our RFC 4880
symmetric writer must interoperate with REAL GnuPG in both directions,
and the distributed file pass must produce gpg-decryptable siblings."""

import gzip
import os
import shutil
import subprocess

import pytest

from storagetapper_spark.sinks.pgp import (
    decrypt_pgp_symmetric,
    encrypt_files_pgp,
    encrypt_pgp_symmetric,
)

GPG = shutil.which("gpg")
PW = "correct horse battery staple"


def _gpg(args, **kw):
    return subprocess.run(
        [GPG, "--batch", "--yes", "--pinentry-mode", "loopback",
         "--passphrase", PW, *args],
        capture_output=True, **kw)


def test_roundtrip_self():
    data = b"seqno,op,payload\n1,insert,x\n" * 1000
    blob = encrypt_pgp_symmetric(data, PW, filename="part-0")
    assert decrypt_pgp_symmetric(blob, PW) == data
    with pytest.raises(ValueError, match="quick-check"):
        decrypt_pgp_symmetric(blob, "wrong")


def test_mdc_tamper_detected():
    data = b"x" * 500
    blob = bytearray(encrypt_pgp_symmetric(data, PW))
    blob[-5] ^= 0xFF                      # flip a byte inside the MDC span
    with pytest.raises(ValueError):
        decrypt_pgp_symmetric(bytes(blob), PW)


@pytest.mark.skipif(GPG is None, reason="no gpg binary")
def test_gpg_decrypts_our_output(tmp_path):
    data = os.urandom(4096) + b"tail"
    enc = tmp_path / "m.pgp"
    enc.write_bytes(encrypt_pgp_symmetric(data, PW, filename="m"))
    out = tmp_path / "m.out"
    r = _gpg(["-o", str(out), "--decrypt", str(enc)])
    assert r.returncode == 0, r.stderr.decode()
    assert out.read_bytes() == data


@pytest.mark.skipif(GPG is None, reason="no gpg binary")
def test_we_decrypt_gpg_output(tmp_path):
    data = b"reference-produced ciphertext\n" * 64
    src = tmp_path / "plain"
    src.write_bytes(data)
    enc = tmp_path / "plain.gpg"
    r = _gpg(["--symmetric", "--cipher-algo", "AES256",
              "--s2k-digest-algo", "SHA256", "--rfc4880",
              "-o", str(enc), str(src)])
    assert r.returncode == 0, r.stderr.decode()
    assert decrypt_pgp_symmetric(enc.read_bytes(), PW) == data


@pytest.mark.skipif(GPG is None, reason="no gpg binary")
def test_distributed_pgp_pass_is_gpg_compatible(spark, tmp_path):
    """File-sink output → executor-side OpenPGP pass → gpg decrypts a
    sibling and the gzip payload round-trips (the full reference chain:
    encode → compress → encrypt, pipe/file.go)."""
    d = tmp_path / "out"
    d.mkdir()
    payload = b'{"seqno": 1}\n' * 200
    (d / "part-0.json.gz").write_bytes(gzip.compress(payload))
    (d / "_DONE").write_text("{}")       # manifests must be skipped

    encrypted = encrypt_files_pgp(spark, str(d), PW)
    assert len(encrypted) == 1 and encrypted[0].endswith(".pgp")
    assert not (d / "part-0.json.gz").exists()   # original removed
    assert (d / "_DONE").exists()

    out = tmp_path / "dec.gz"
    r = _gpg(["-o", str(out), "--decrypt", encrypted[0]])
    assert r.returncode == 0, r.stderr.decode()
    assert gzip.decompress(out.read_bytes()) == payload


def test_s2k_small_count_clamps_to_full_block():
    """RFC 4880 §3.7.1.3: at least the full salt+passphrase is hashed
    even when the S2K count is smaller than the block (ADVICE r5) —
    a foreign message with a tiny count + long passphrase must derive
    the same key gpg would."""
    import hashlib

    from storagetapper_spark.sinks.pgp import _s2k_count, _s2k_derive

    salt = bytes(range(8))
    long_pw = b"p" * 4096                      # block 4104 > count(0)=1024
    assert _s2k_count(0) < len(salt + long_pw)
    assert _s2k_derive(long_pw, salt, 0) == \
        hashlib.sha256(salt + long_pw).digest()
    # and an unclamped count still hashes exactly `count` octets
    block = salt + b"pw"
    total = _s2k_count(0)
    full, rem = divmod(total, len(block))
    assert _s2k_derive(b"pw", salt, 0) == \
        hashlib.sha256(block * full + block[:rem]).digest()
