"""Behavioral tests of ui/dist/app.js pure logic (VERDICT r4 #7).

These execute the REAL shipped JavaScript through tests/minijs.py (no JS
engine ships in this image) instead of string-pinning it: cacheKey/djb2,
PNG tEXt parsing, A1111 parameter resume, and message-eviction
bookkeeping are asserted as behaviors with independently computed
expectations. Reference contracts:
/root/reference/lcm-sr-ui/src/utils/cache.js:19-56 (djb2 cache key),
src/lib/pngMeta.js:66-105 (tEXt parse + A1111 param apply),
src/hooks/useChatMessages.js + useScrollManagement.js (eviction +
position preservation).
"""

import json
import os

import numpy as np
import pytest

from tests.minijs import (
    Interpreter,
    JSArrayBuffer,
    MiniJSError,
    UNDEFINED,
    extract_function,
)

APP_JS = os.path.join(os.path.dirname(__file__), "..", "ui", "dist", "app.js")


@pytest.fixture(scope="module")
def app_src():
    with open(APP_JS) as f:
        return f.read()


# ---------------------------------------------------------------------------
# interpreter self-tests (the tool must be trustworthy before it vouches
# for the UI)
# ---------------------------------------------------------------------------


def test_minijs_js_semantics():
    it = Interpreter()
    run = lambda src: it.run(src)
    # int32 bitwise wrap — the exact ops djb2 relies on
    assert run("return ((5381 << 5) + 5381) ^ 97;") == float((5381 * 33) ^ 97)
    assert run("let h = -1; return h >>> 0;") == float(0xFFFFFFFF)
    assert run("return (0x7FFFFFFF << 1) | 0;") == float(-2)
    assert run("return (255).toString(16);") == "ff"
    assert run("return 'ab'.charCodeAt(1);") == 98.0
    assert run("return '7'.padStart(3, '0');") == "007"
    # JS number stringification inside JSON
    assert run("return JSON.stringify({a: 3, b: 'x', c: 1.5});") == \
        '{"a":3,"b":"x","c":1.5}'
    # template literals, ternary, ||
    assert run("const x = {s: 'a', l: 3}; return `${x.s}:${x.l}`;") == "a:3"
    assert run("return (0 || 'fallback');") == "fallback"
    assert run("let o = {}; o['k'] = 1; o.k += 2; return o.k;") == 3.0
    # loops + arrays
    assert run("""
      let total = 0;
      const xs = [1, 2, 3, 4];
      for (let i = 0; i < xs.length; i++) { if (xs[i] === 3) continue;
        total += xs[i]; }
      for (const x of xs) total += x;
      xs.forEach((x) => { total += x; });
      return total;
    """) == float((1 + 2 + 4) + 10 + 10)
    # String()/Number() coercion table used by cacheKey
    assert run("return String(undefined);") == "undefined"
    assert run("return Number('12') || 0;") == 12.0
    assert run("return Number('nope') || 0;") == 0.0
    assert run("return Number(undefined) || 0;") == 0.0


def test_minijs_rejects_unknown_syntax():
    with pytest.raises(MiniJSError):
        Interpreter().run("yield wat;")


def test_minijs_coercion_semantics():
    """The code-review r5 fidelity set: ToInt32 on NaN/Infinity, slice
    with undefined, loose-equality boolean coercion, parseInt prefix
    parsing, per-iteration for-let closures, numeric object keys."""
    it = Interpreter()
    run = lambda src: it.run(src)
    assert run("return Number('x') | 0;") == 0.0
    assert run("return Infinity >>> 0;") == 0.0
    assert run("return 'hello'.slice(1, undefined);") == "ello"
    assert run("return 0 == false;") is True
    assert run("return 1 == true;") is True
    assert run("return parseInt('512x512');") == 512.0
    assert run("return parseInt('  -42px');") == -42.0
    assert run("""
      let fns = [];
      for (let i = 0; i < 3; i++) fns.push(() => i);
      return fns[0]() + ':' + fns[1]() + ':' + fns[2]();
    """) == "0:1:2"
    assert run("let o = {}; o[1] = 5; return o[1] + o['1'];") == 10.0
    # JS string escapes decode positionally: '\\\\t' is backslash + letter t
    assert run(r"return '\\t'.length;") == 2.0
    # UTF-16: emoji counts 2 units; charCodeAt yields surrogate halves
    assert run("return '\U0001F431'.length;") == 2.0
    assert run("return '\U0001F431'.charCodeAt(0);") == float(0xD83D)


def test_minijs_typed_array_bounds_throw():
    from tests.minijs import JSArrayBuffer

    it = Interpreter()
    it.run("function f(buf) { return new Uint8Array(buf, 4, 100); }")
    with pytest.raises(MiniJSError, match="RangeError"):
        it.call("f", JSArrayBuffer(b"12345678"))
    it.run("function g(buf) { return new DataView(buf).getUint32(6); }")
    with pytest.raises(MiniJSError, match="RangeError"):
        it.call("g", JSArrayBuffer(b"12345678"))


# ---------------------------------------------------------------------------
# cacheKey / djb2
# ---------------------------------------------------------------------------


def _djb2_hex(s: str) -> str:
    """Independent Python djb2 over UTF-16 code units (JS charCodeAt):
    non-BMP characters hash as TWO surrogate units, exactly as in every
    browser (code-review r5: iterating code points would share a blind
    spot with any interpreter bug on the same axis)."""
    data = s.encode("utf-16-le")
    units = [int.from_bytes(data[i:i + 2], "little")
             for i in range(0, len(data), 2)]
    h = 5381
    for u in units:
        h = ((((h << 5) + h) & 0xFFFFFFFFFFFFFFFF) ^ u)
        # emulate JS int32 coercion of the ^ result
        h &= 0xFFFFFFFF
        if h >= 0x80000000:
            h -= 0x100000000
    return format(h & 0xFFFFFFFF, "08x")


def _cache_key(app_src, params):
    it = Interpreter()
    it.run(extract_function(app_src, "cacheKey"))
    return it.call("cacheKey", params)


def test_cache_key_matches_independent_djb2(app_src):
    params = {"prompt": "  A Cat  ", "size": "512x512",
              "num_inference_steps": 4.0, "guidance_scale": 1.0,
              "seed": 7.0}
    key = _cache_key(app_src, params)
    normalized = {"p": "a cat", "sz": "512x512", "st": 4, "cfg": 1,
                  "sd": 7, "sr": 0, "srf": "", "neg": "", "sty": "",
                  "md": ""}
    expect = _djb2_hex(json.dumps(normalized, separators=(",", ":"),
                                  ensure_ascii=False))
    assert key == expect
    assert len(key) == 8 and int(key, 16) >= 0


def test_cache_key_non_bmp_prompt_matches_utf16_djb2(app_src):
    """Emoji prompts hash over surrogate PAIRS (JS charCodeAt semantics):
    the interpreter's charCodeAt/length and the independent Python djb2
    must both count UTF-16 code units or they'd share a blind spot."""
    params = {"prompt": "a cat \U0001F431", "size": "512x512",
              "num_inference_steps": 4.0, "guidance_scale": 1.0,
              "seed": 7.0}
    key = _cache_key(app_src, params)
    normalized = {"p": "a cat \U0001F431", "sz": "512x512", "st": 4,
                  "cfg": 1, "sd": 7, "sr": 0, "srf": "", "neg": "",
                  "sty": "", "md": ""}
    expect = _djb2_hex(json.dumps(normalized, separators=(",", ":"),
                                  ensure_ascii=False))
    assert key == expect


def test_cache_key_normalization_behaviors(app_src):
    base = {"prompt": "a cat", "size": "512x512",
            "num_inference_steps": 4.0, "guidance_scale": 1.0, "seed": 7.0}
    k = lambda **over: _cache_key(app_src, {**base, **over})
    # prompt case/whitespace-insensitive (reference cache.js normalization)
    assert k() == k(prompt="  A CAT ")
    # every functional field is key-relevant
    assert k() != k(seed=8.0)
    assert k() != k(num_inference_steps=2.0)
    assert k() != k(guidance_scale=3.0)
    assert k() != k(size="256x256")
    assert k() != k(negative_prompt="blurry")
    assert k() != k(mode="sdxl")
    assert k() != k(style_lora={"style": "anime", "level": 3.0})
    # superres variants differ from base AND from each other
    sr1 = k(superres=True, superres_magnitude=2.0)
    sr2 = k(superres=True, superres_magnitude=3.0)
    assert len({k(), sr1, sr2}) == 3
    # format/quality only matter when superres is on
    assert k(superres_format="webp") == k()


# ---------------------------------------------------------------------------
# PNG tEXt parse (parameter-resume contract)
# ---------------------------------------------------------------------------


def _parse_png(app_src, data: bytes):
    it = Interpreter()
    it.run(extract_function(app_src, "parsePngText"))
    return it.call("parsePngText", JSArrayBuffer(data))


def test_parse_png_text_reads_real_worker_output(app_src):
    """The UI parser must read the tEXt chunks the serving worker writes —
    the full producer→consumer metadata round trip."""
    from dreamlab_tpu.engine.tpu_worker import png_encode

    arr = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    meta = {"parameters": "a cat\nSteps: 4, CFG scale: 1, Seed: 7, "
                          "Size: 512x512"}
    out = _parse_png(app_src, png_encode(arr, metadata=meta))
    assert out["parameters"] == meta["parameters"]


def test_parse_png_text_edge_cases(app_src):
    from dreamlab_tpu.engine.tpu_worker import png_encode

    arr = np.zeros((4, 4, 3), np.uint8)
    # no metadata → {}
    assert dict(_parse_png(app_src, png_encode(arr))) == {}
    # not a PNG → {} (no crash)
    assert dict(_parse_png(app_src, b"GIF89a" + b"\x00" * 64)) == {}
    # multiple tEXt chunks all surface
    out = _parse_png(app_src, png_encode(arr, metadata={
        "parameters": "x", "software": "dreamlab"}))
    assert out["parameters"] == "x" and out["software"] == "dreamlab"
    # latin-1 payloads decode (the spec encoding)
    out = _parse_png(app_src, png_encode(arr, metadata={"t": "caf\xe9"}))
    assert out["t"] == "caf\xe9"
    # truncated file: a chunk length pointing past the buffer must stop
    # parsing, not throw (browsers raise RangeError on the oob Uint8Array
    # view — the guard in parsePngText returns what was parsed so far;
    # minijs enforces the same RangeError so this is a REAL behavior test)
    full = png_encode(arr, metadata={"parameters": "x" * 200})
    truncated = full[: len(full) // 2]
    out = _parse_png(app_src, truncated)
    assert isinstance(dict(out), dict)  # no crash; partial or empty


# ---------------------------------------------------------------------------
# A1111 parameter resume (applyA1111Params)
# ---------------------------------------------------------------------------


class FakeField:
    def __init__(self):
        self.value = ""


def test_apply_a1111_params(app_src):
    fields = {name: FakeField() for name in
              ("prompt", "p-steps", "p-cfg", "p-seed", "p-size")}
    it = Interpreter(globals_={"$": lambda fid: fields[fid]})
    it.run(extract_function(app_src, "applyA1111Params"))
    it.call("applyA1111Params",
            "a majestic cat\nSteps: 6, CFG scale: 2.5, Seed: 99, "
            "Size: 768x512")
    assert fields["prompt"].value == "a majestic cat"
    assert fields["p-steps"].value == "6"
    assert fields["p-cfg"].value == "2.5"
    assert fields["p-seed"].value == "99"
    assert fields["p-size"].value == "768x512"
    # prompt-only text: params untouched
    it.call("applyA1111Params", "just a prompt")
    assert fields["prompt"].value == "just a prompt"
    assert fields["p-steps"].value == "6"  # unchanged


# ---------------------------------------------------------------------------
# message eviction + scroll position preservation (pruneMessages)
# ---------------------------------------------------------------------------


class FakeNode:
    def __init__(self, box, height, blob_urls=()):
        self._box = box
        self.offsetHeight = float(height)
        self._blob_urls = list(blob_urls)

    def querySelectorAll(self, selector):
        if selector == "[data-blob-url]":
            return [FakeTagged(u) for u in self._blob_urls]
        return []

    def remove(self):
        self._box.children.remove(self)


class FakeTagged:
    def __init__(self, url):
        self.dataset = type("DS", (), {"blobUrl": url})()


class FakeBox:
    def __init__(self):
        self.children = []
        self.scrollTop = 500.0

    @property
    def firstElementChild(self):
        return self.children[0] if self.children else None


def _prune_env(app_src, stuck):
    box = FakeBox()
    revoked = []
    it = Interpreter(globals_={
        "$": lambda fid: box,
        "MAX_MESSAGES": 3.0,
        "SCROLL": {"stuck": stuck},
        "URL": {"revokeObjectURL": lambda u: revoked.append(u)},
    })
    it.run(extract_function(app_src, "revokeBlobUrls"))
    it.run(extract_function(app_src, "pruneMessages"))
    return it, box, revoked


def test_prune_messages_evicts_oldest_and_revokes(app_src):
    it, box, revoked = _prune_env(app_src, stuck=True)
    for i in range(5):
        box.children.append(FakeNode(box, height=100 + i,
                                     blob_urls=[f"blob:{i}"]))
    it.call("pruneMessages")
    # oldest evicted down to MAX_MESSAGES, in order, with their blobs freed
    assert [n._blob_urls[0] for n in box.children] == \
        ["blob:2", "blob:3", "blob:4"]
    assert revoked == ["blob:0", "blob:1"]
    # stuck at bottom: reading position NOT adjusted (auto-follow owns it)
    assert box.scrollTop == 500.0


def test_prune_messages_preserves_reading_position(app_src):
    """useScrollManagement's position-preservation contract: when history
    shrinks above the viewport while the user is scrolled up, scrollTop
    moves up by exactly the evicted pixels so content doesn't jump."""
    it, box, revoked = _prune_env(app_src, stuck=False)
    for i in range(5):
        box.children.append(FakeNode(box, height=120, blob_urls=[]))
    it.call("pruneMessages")
    assert len(box.children) == 3
    assert box.scrollTop == 500.0 - 2 * 120


def test_prune_messages_clamps_scrolltop_at_zero(app_src):
    it, box, revoked = _prune_env(app_src, stuck=False)
    box.scrollTop = 50.0
    for i in range(5):
        box.children.append(FakeNode(box, height=300, blob_urls=[]))
    it.call("pruneMessages")
    assert box.scrollTop == 0.0  # Math.max(0, 50 - 300 ...) per eviction


def test_prune_messages_noop_under_limit(app_src):
    it, box, revoked = _prune_env(app_src, stuck=False)
    for i in range(2):
        box.children.append(FakeNode(box, height=100, blob_urls=["blob:x"]))
    it.call("pruneMessages")
    assert len(box.children) == 2 and revoked == []
    assert box.scrollTop == 500.0


# ---------------------------------------------------------------------------
# dream-mode mutation logic (dreamVariation / mutateParams / eightDigitSeed)
# ---------------------------------------------------------------------------


def _extract_const(src, name):
    import re

    m = re.search(rf"const {name} = \[", src)
    end = src.index("];", m.start())
    return src[m.start():end + 2]


def _dream_env(app_src, rng_seed=0, steps="4", cfg="1"):
    """Interpreter with a REAL seeded PRNG injected over Math.random (the
    built-in stub returns 0.5, which would hide distributional behavior)."""
    import math as pymath
    import random as pyrandom

    rng = pyrandom.Random(rng_seed)
    fields = {"p-steps": FakeField(), "p-cfg": FakeField()}
    fields["p-steps"].value = steps
    fields["p-cfg"].value = cfg
    it = Interpreter(globals_={"$": lambda fid: fields[fid]})
    it.globals.vars["Math"] = {
        **it.globals.get("Math"),
        "random": lambda: rng.random(),
    }
    it.run(_extract_const(app_src, "DREAM_MODIFIERS"))
    for fn in ("eightDigitSeed", "dreamVariation", "mutateParams"):
        it.run(extract_function(app_src, fn))
    return it, fields


def test_dream_seed_is_always_eight_digits(app_src):
    it, _ = _dream_env(app_src)
    for _ in range(200):
        seed = it.call("eightDigitSeed")
        assert 10000000 <= seed <= 99999999 and seed == int(seed)


def test_dream_variation_modifier_contract(app_src):
    it, _ = _dream_env(app_src, rng_seed=3)
    mods_src = _extract_const(app_src, "DREAM_MODIFIERS")
    for temp in (0.0, 0.5, 1.0):
        for _ in range(50):
            out = it.call("dreamVariation", "  a cat  ", temp)
            assert out.startswith("a cat")  # base prompt trimmed
            suffix = out[len("a cat"):]
            mods = [m for m in suffix.split(", ") if m]
            # numMods = floor(rand * (1 + 3*temp)) + 1 → max is
            # floor(1 + 3*temp - eps) + 1; no duplicates; all known
            import math as pymath

            max_mods = int(pymath.ceil(1 + 3 * temp)) if (1 + 3 * temp) != int(
                1 + 3 * temp) else int(1 + 3 * temp)
            assert 1 <= len(mods) <= max_mods
            assert len(mods) == len(set(mods))
            for m in mods:
                assert f'"{m}"' in mods_src, f"unknown modifier {m!r}"


def test_mutate_params_bounds_and_temperature(app_src):
    # temperature 0: only a fresh seed, params untouched
    it, _ = _dream_env(app_src, rng_seed=1)
    out = it.call("mutateParams", 0.0)
    assert set(out.keys()) == {"seed"}
    # temperature 1: whatever mutates stays inside the serving contract's
    # validation bounds (steps 1..50, guidance 0..20)
    it, _ = _dream_env(app_src, rng_seed=2, steps="48", cfg="19.5")
    saw_steps = saw_cfg = False
    for _ in range(100):
        out = it.call("mutateParams", 1.0)
        assert 10000000 <= out["seed"] <= 99999999
        if "num_inference_steps" in out:
            saw_steps = True
            assert 1 <= out["num_inference_steps"] <= 50
        if "guidance_scale" in out:
            saw_cfg = True
            assert 0 <= out["guidance_scale"] <= 20
    assert saw_steps and saw_cfg
