"""decode_real dispatch (operators/multimodal.py): the codec hook must
route image→PIL, audio→soundfile, video→PyAV when the library is
importable, and refuse loudly when it is not.  The sandbox ships no
media codecs, so each branch is pinned by INJECTING a minimal fake
module (with a real ModuleSpec, so ``importlib.util.find_spec`` sees
it) — the dispatch, payload threading, and array conversion are the
engine's code; only the codec internals are faked."""
from __future__ import annotations

import importlib.machinery
import sys
import types

import numpy as np
import pytest

from gorilla_tsc_spark.operators.multimodal import decode_real


def _register(name: str, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture
def _clean_modules():
    saved = {k: sys.modules.get(k)
             for k in ("PIL", "PIL.Image", "soundfile", "av")}
    yield
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def test_no_codec_raises(_clean_modules):
    for k in ("PIL", "PIL.Image", "soundfile", "av"):
        sys.modules.pop(k, None)
    for media in ("image", "audio", "video"):
        with pytest.raises(NotImplementedError):
            decode_real(b"\x00\x01", media)


def test_image_routes_to_pil(_clean_modules):
    seen = {}

    class Image:
        @staticmethod
        def open(bio):
            seen["payload"] = bio.read()
            return [[1, 2], [3, 4]]

    img_mod = _register("PIL.Image", open=Image.open)
    _register("PIL", Image=img_mod)
    out = decode_real(b"png-bytes", "image")
    assert seen["payload"] == b"png-bytes"
    assert isinstance(out, np.ndarray) and out.shape == (2, 2)


def test_audio_routes_to_soundfile(_clean_modules):
    seen = {}

    def read(bio):
        seen["payload"] = bio.read()
        return [0.1, -0.2, 0.3], 16_000

    _register("soundfile", read=read)
    out = decode_real(b"wav-bytes", "audio")
    assert seen["payload"] == b"wav-bytes"
    assert isinstance(out, np.ndarray) and out.shape == (3,)


def test_video_routes_to_av(_clean_modules):
    seen = {}

    class _Frame:
        def __init__(self, i):
            self.i = i

        def to_ndarray(self, format):
            seen["format"] = format
            return np.full((2, 2, 3), self.i, dtype=np.uint8)

    class _Container:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video):
            seen["stream"] = video
            return [_Frame(0), _Frame(1)]

    def av_open(bio):
        seen["payload"] = bio.read()
        return _Container()

    _register("av", open=av_open)
    out = decode_real(b"mp4-bytes", "video")
    assert seen == {"payload": b"mp4-bytes", "stream": 0,
                    "format": "rgb24"}
    assert out.shape == (2, 2, 2, 3)
