"""Minimal RFC 4880 symmetric OpenPGP container — wire-compatible with
GnuPG (tested: gpg decrypts our output; we decrypt gpg's).

The reference encrypts file-sink output as OpenPGP
(pipe/file.go:384-437, via golang.org/x/crypto/openpgp).  The engine's
default stays AES-256-GCM (``sinks/files.encrypt_files`` — authenticated
encryption, simpler keys), but consumers that must decrypt with standard
PGP tooling can use this module: the same post-write per-file pass,
producing a passphrase-symmetric OpenPGP message:

    SKESK (tag 3):  v4, AES-256, S2K iterated+salted SHA-256
    SEIPD (tag 18): v1, AES-256-CFB over
                    prefix(16+2) || Literal(tag 11) || MDC(tag 19)

Only the symmetric path is implemented (the reference's deployment uses
shared-passphrase encryption per stream); public-key SEIPD would ride
the same packet framing.  Pure-Python packet assembly + the
``cryptography`` primitives — the per-file work runs in executors via
``encrypt_files_pgp`` exactly like the GCM path, so crypto scales with
the write at 100 TB.
"""

from __future__ import annotations

import hashlib
import os
import secrets
import struct

_AES256 = 9          # RFC 4880 §9.2
_SHA256 = 8          # RFC 4880 §9.4
_S2K_ITER_SALTED = 3
_DEFAULT_COUNT_OCTET = 0xE0  # ~4.2M octets hashed — gpg's modern default range


def _s2k_count(octet: int) -> int:
    return (16 + (octet & 15)) << ((octet >> 4) + 6)


def _s2k_derive(passphrase: bytes, salt: bytes,
                count_octet: int = _DEFAULT_COUNT_OCTET) -> bytes:
    """Iterated+salted S2K (RFC 4880 §3.7.1.3) with SHA-256 → 32-byte
    AES-256 key (single hash context: digest size == key size)."""
    block = salt + passphrase
    # §3.7.1.3: hash at least the full salt+passphrase once even when
    # the iteration count is smaller than the block
    total = max(_s2k_count(count_octet), len(block))
    h = hashlib.sha256()
    full, rem = divmod(total, len(block))
    h.update(block * full)
    h.update(block[:rem])
    return h.digest()


def _pkt(tag: int, body: bytes) -> bytes:
    """New-format packet header (RFC 4880 §4.2.2) with minimal length."""
    n = len(body)
    if n < 192:
        ln = bytes([n])
    elif n < 8384:
        n2 = n - 192
        ln = bytes([192 + (n2 >> 8), n2 & 0xFF])
    else:
        ln = b"\xff" + struct.pack(">I", n)
    return bytes([0xC0 | tag]) + ln + body


def _cfb(key: bytes, data: bytes, decrypt: bool = False) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    try:  # CFB moved to the decrepit namespace in cryptography >= 48
        from cryptography.hazmat.decrepit.ciphers.modes import CFB
    except ImportError:
        from cryptography.hazmat.primitives.ciphers.modes import CFB

    c = Cipher(algorithms.AES(key), CFB(b"\x00" * 16))
    ctx = c.decryptor() if decrypt else c.encryptor()
    return ctx.update(data) + ctx.finalize()


def encrypt_pgp_symmetric(data: bytes, passphrase: str,
                          filename: str = "") -> bytes:
    """``data`` → a complete OpenPGP message (SKESK + SEIPD) any RFC
    4880 implementation can decrypt with the passphrase."""
    salt = secrets.token_bytes(8)
    key = _s2k_derive(passphrase.encode(), salt)
    skesk = _pkt(3, bytes([4, _AES256, _S2K_ITER_SALTED, _SHA256])
                 + salt + bytes([_DEFAULT_COUNT_OCTET]))

    fname = filename.encode()[:255]
    literal = _pkt(11, b"b" + bytes([len(fname)]) + fname
                   + b"\x00\x00\x00\x00" + data)
    prefix = secrets.token_bytes(16)
    prefix += prefix[14:16]            # quick-check repeat (§5.13)
    mdc_body = hashlib.sha1(prefix + literal + b"\xd3\x14").digest()
    mdc = b"\xd3\x14" + mdc_body       # tag 19 is always old-style 0xD3 0x14
    seipd = _pkt(18, b"\x01" + _cfb(key, prefix + literal + mdc))
    return skesk + seipd


def _read_pkt(blob: bytes, off: int) -> tuple[int, bytes, int]:
    """(tag, body, next_offset) for one packet; handles new- and
    old-format headers plus new-format partial body lengths (gpg emits
    partial lengths for streamed SEIPD bodies)."""
    first = blob[off]
    if first & 0x40:                   # new format
        tag = first & 0x3F
        off += 1
        body = b""
        while True:
            o1 = blob[off]
            if o1 < 192:
                n, off = o1, off + 1
                body += blob[off:off + n]
                off += n
                return tag, body, off
            if o1 < 224:
                n = ((o1 - 192) << 8) + blob[off + 1] + 192
                off += 2
                body += blob[off:off + n]
                off += n
                return tag, body, off
            if o1 == 255:
                n = struct.unpack(">I", blob[off + 1:off + 5])[0]
                off += 5
                body += blob[off:off + n]
                off += n
                return tag, body, off
            # partial body length: 1 << (o1 & 0x1f), more chunks follow
            n = 1 << (o1 & 0x1F)
            off += 1
            body += blob[off:off + n]
            off += n
    else:                              # old format
        tag = (first >> 2) & 0x0F
        lt = first & 3
        off += 1
        if lt == 0:
            n, off = blob[off], off + 1
        elif lt == 1:
            n = struct.unpack(">H", blob[off:off + 2])[0]
            off += 2
        elif lt == 2:
            n = struct.unpack(">I", blob[off:off + 4])[0]
            off += 4
        else:
            n = len(blob) - off
        return tag, blob[off:off + n], off + n


def decrypt_pgp_symmetric(blob: bytes, passphrase: str) -> bytes:
    """Parse + decrypt an OpenPGP symmetric message (ours or GnuPG's
    RFC 4880 output), verify the CFB quick-check bytes and the MDC, and
    return the literal data."""
    off, key, plain = 0, None, None
    while off < len(blob):
        tag, body, off = _read_pkt(blob, off)
        if tag == 3:                   # SKESK
            if body[0] != 4 or body[1] != _AES256:
                raise ValueError("unsupported SKESK version/cipher")
            if body[2] != _S2K_ITER_SALTED:
                raise ValueError("unsupported S2K type")
            halg, salt, cnt = body[3], body[4:12], body[12]
            if halg == _SHA256:
                key = _s2k_derive(passphrase.encode(), salt, cnt)
            elif halg == 2:            # SHA-1: stretch to 32 bytes (§3.7.1.1)
                block = salt + passphrase.encode()
                # §3.7.1.3 clamp: never hash less than one full block
                total = max(_s2k_count(cnt), len(block))
                out = b""
                for pre in range(2):   # two contexts, zero-preloaded
                    h = hashlib.sha1(b"\x00" * pre)
                    full, rem = divmod(total, len(block))
                    h.update(block * full)
                    h.update(block[:rem])
                    out += h.digest()
                key = out[:32]
            else:
                raise ValueError(f"unsupported S2K hash {halg}")
        elif tag == 18:                # SEIPD v1
            if body[0] != 1:
                raise ValueError("unsupported SEIPD version")
            if key is None:
                raise ValueError("no SKESK before SEIPD")
            plain = _cfb(key, body[1:], decrypt=True)
            if plain[14:16] != plain[16:18]:
                raise ValueError("bad passphrase (quick-check mismatch)")
            inner, mdc = plain[18:-22], plain[-22:]
            if mdc[:2] != b"\xd3\x14" or hashlib.sha1(
                    plain[:-22] + b"\xd3\x14").digest() != mdc[2:]:
                raise ValueError("MDC integrity check failed")
            t2, lit, _ = _read_pkt(inner, 0)
            if t2 == 8:                # compressed (gpg default) — tag 8
                algo, cdata = lit[0], lit[1:]
                import zlib
                if algo == 1:          # ZIP = raw deflate
                    inner = zlib.decompress(cdata, wbits=-15)
                elif algo == 2:        # ZLIB
                    inner = zlib.decompress(cdata)
                else:
                    raise ValueError(f"unsupported compression {algo}")
                t2, lit, _ = _read_pkt(inner, 0)
            if t2 != 11:
                raise ValueError(f"expected literal packet, got tag {t2}")
            fn_len = lit[1]
            return lit[2 + fn_len + 4:]
    raise ValueError("no SEIPD packet found")


def encrypt_files_pgp(spark, path: str, passphrase: str,
                      suffix: str = ".pgp") -> list[str]:
    """Distributed post-write OpenPGP pass — same shape as
    ``files.encrypt_files_distributed`` (binaryFile scan → per-file
    encrypt in executors → originals removed by the driver), producing
    gpg-decryptable ``.pgp`` siblings.  Reference parity for
    pipe/file.go:384-437."""
    import pandas as pd
    from pyspark.sql import types as T

    from storagetapper_spark.sinks.files import _resolve_fs

    out_schema = T.StructType([T.StructField("src", T.StringType()),
                               T.StructField("dst", T.StringType())])

    def enc_batch(batches):
        import posixpath

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                base = posixpath.basename(p)
                if base.startswith(("_", ".")) or p.endswith(suffix):
                    continue
                fs, fp = _resolve_fs(p)
                blob = encrypt_pgp_symmetric(bytes(content), passphrase,
                                             filename=base)
                with fs.open_output_stream(fp + suffix) as f:
                    f.write(blob)
                rows.append((p, p + suffix))
            yield pd.DataFrame(rows, columns=["src", "dst"])

    done = (spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true").load(path)
            .select("path", "content")
            .mapInPandas(enc_batch, out_schema)
            .collect())
    for r in done:
        fs, fp = _resolve_fs(r.src)
        fs.delete_file(fp)
    return sorted(_resolve_fs(r.dst)[1] for r in done)
