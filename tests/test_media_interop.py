"""Cross-decoder interop for the WAV and BMP codecs against the JVM's
reference implementations (javax.sound.sampled, javax.imageio — reached
through the Spark py4j gateway, no extra dependencies).

Same rationale as tests/test_image_interop.py: roundtrip tests can be
self-consistent yet wrong for externally produced files (the round-5
TIFF-LZW width-timing bug was exactly that shape). These laws pin the
audio lane's G.711 expansion and PCM framing, and the BMP codec, against
independent decoders.
"""

import struct

import numpy as np
import pytest

from whitebox_tools_spark.operators import media


@pytest.fixture(scope="module")
def jvm(spark):
    return spark.sparkContext._jvm


def _wav(afmt, bits, body, ch=1, rate=8000):
    fmt = struct.pack("<HHIIHH", afmt, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body
              + (b"\x00" if len(body) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _javax_pcm16(jvm, data: bytes) -> np.ndarray:
    """Decode WAV bytes with javax.sound, converting to little-endian
    PCM_SIGNED 16-bit; returns the flat int16 sample stream."""
    AS = jvm.javax.sound.sampled.AudioSystem
    AF = jvm.javax.sound.sampled.AudioFormat
    Enc = jvm.javax.sound.sampled.AudioFormat.Encoding
    ais = AS.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(data)))
    f = ais.getFormat()
    if f.getEncoding().toString() != "PCM_SIGNED" or f.getSampleSizeInBits() != 16:
        target = AF(Enc.PCM_SIGNED, f.getSampleRate(), 16,
                    f.getChannels(), 2 * f.getChannels(),
                    f.getSampleRate(), False)
        ais = AS.getAudioInputStream(target, ais)
    return np.frombuffer(bytes(ais.readAllBytes()), "<i2")


@pytest.mark.parametrize("afmt", [7, 6], ids=["ulaw", "alaw"])
def test_g711_matches_javax_sound_all_codes(jvm, afmt):
    # javax.sound ships Sun's original G.711 conversion — the same
    # reference the LUTs implement. All 256 codes must agree exactly.
    codes = np.arange(256, dtype=np.uint8)
    data = _wav(afmt, 8, codes.tobytes())
    theirs = _javax_pcm16(jvm, data)
    _, ours = media.decode_wav(data)
    np.testing.assert_array_equal(theirs, ours[:, 0])


def test_pcm16_wav_ours_to_javax_exact(jvm):
    rng = np.random.RandomState(1)
    s = rng.randint(-32768, 32768, (300, 2)).astype(np.int16)
    theirs = _javax_pcm16(jvm, media.encode_wav(s, 16000)).reshape(-1, 2)
    np.testing.assert_array_equal(theirs, s)


def test_pcm8_wav_matches_javax(jvm):
    # conventions differ on the positive half: javax scales by
    # 32767/127 where we shift ((u-128)<<8, the sox/libsndfile
    # convention). The top byte — the information the 8-bit sample
    # actually carries — must agree for every code, and the negative
    # half (where both conventions coincide) must be exact.
    u = np.arange(256, dtype=np.uint8)
    data = _wav(1, 8, u.tobytes())
    theirs = _javax_pcm16(jvm, data).astype(np.int64)
    _, ours = media.decode_wav(data)
    ours = ours[:, 0].astype(np.int64)
    np.testing.assert_array_equal(theirs >> 8, ours >> 8)
    np.testing.assert_array_equal(theirs[:129], ours[:129])


# ------------------------------------------------------------ BMP interop


def _imageio_rgb(jvm, data: bytes) -> np.ndarray:
    bis = jvm.java.io.ByteArrayInputStream(bytearray(data))
    bi = jvm.javax.imageio.ImageIO.read(bis)
    assert bi is not None, "javax.imageio could not parse our BMP"
    w, h = bi.getWidth(), bi.getHeight()
    argb = bi.getRGB(0, 0, w, h, None, 0, w)
    a = np.array(argb, dtype=np.int64).reshape(h, w)
    return np.stack(
        [(a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF], axis=2
    ).astype(np.uint8)


def test_bmp_ours_to_imageio_exact(jvm):
    img = (np.arange(20 * 16 * 3, dtype=np.int64) % 251).astype(
        np.uint8).reshape(20, 16, 3)
    theirs = _imageio_rgb(jvm, media.encode_bmp(img))
    assert np.array_equal(theirs, img)


def test_bmp_imageio_to_ours_exact(jvm):
    img = (np.arange(11 * 13 * 3, dtype=np.int64) % 251).astype(
        np.uint8).reshape(11, 13, 3)
    h, w = img.shape[:2]
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            bi.setRGB(x, y, int((int(img[y, x, 0]) << 16)
                                | (int(img[y, x, 1]) << 8)
                                | int(img[y, x, 2])))
    bos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "bmp", bos)
    ours = media.decode_bmp(bytes(bos.toByteArray()))
    assert np.array_equal(ours, img)
