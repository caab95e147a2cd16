"""C++ runtime layer tests: parser parity, PNG roundtrip, event queue."""

import os

import numpy as np
import pytest

from ray_tracing_tpu import native
from ray_tracing_tpu.scene import parser as pyparser
from ray_tracing_tpu.scene.native import parse_objects_native
from ray_tracing_tpu.scene.parser import SceneParseError


@pytest.fixture(scope="module")
def lib():
    l = native.lib()
    if l is None:
        pytest.skip("no C++ toolchain available")
    return l


def assert_objects_equal(a, b):
    assert len(a) == len(b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert x.kind == y.kind, i
        np.testing.assert_allclose(x.p0, y.p0, rtol=1e-6, err_msg=str(i))
        np.testing.assert_allclose(x.p1, y.p1, rtol=1e-6, err_msg=str(i))
        np.testing.assert_allclose(x.albedo, y.albedo, rtol=1e-6, err_msg=str(i))
        assert x.roughness == pytest.approx(y.roughness, rel=1e-6), i
        assert x.reflectance == pytest.approx(y.reflectance, rel=1e-6), i
        assert x.metallic == pytest.approx(y.metallic, rel=1e-6), i
        assert x.emission_power == pytest.approx(y.emission_power, rel=1e-6), i
        np.testing.assert_allclose(x.emission_color, y.emission_color, rtol=1e-6, err_msg=str(i))


def test_parser_parity_reference_scenes(lib, scene0_text, scene1_text, scene2_text):
    for text in (scene0_text, scene1_text, scene2_text):
        assert_objects_equal(parse_objects_native(text), pyparser.parse_objects(text))


def test_parser_parity_generated_corpus(lib):
    rng = np.random.default_rng(0)
    chunks = []
    for i in range(50):
        if i % 2 == 0:
            chunks.append(
                f"sphere radius {rng.uniform(0.1, 5):.3f} center "
                f"{{{rng.uniform(-9, 9):.3f} {rng.uniform(-9, 9):.3f} {rng.uniform(-9, 9):.3f}}} "
                f"albedo    {{{rng.uniform(0,1):.3f} {rng.uniform(0,1):.3f} {rng.uniform(0,1):.3f}}} "
                f"roughness {rng.uniform(0,1):.3f} metallic    {rng.uniform(0,1):.3f} "
                f"emission_power {rng.uniform(0, 8):.3f}"
            )
        else:
            chunks.append(
                f"cube origin {{{rng.uniform(-9, 9):.3f} -{rng.uniform(0, 9):.3f} {rng.uniform(-9, 9):.3f}}} "
                f"size {{{rng.uniform(0, 5):.3f} {rng.uniform(0, 5):.3f} {rng.uniform(0, 5):.3f}}} "
                f"reflectance {rng.uniform(0,1):.3f}"
            )
    text = "\n".join(chunks)
    assert_objects_equal(parse_objects_native(text), pyparser.parse_objects(text))


def test_parser_native_errors(lib):
    with pytest.raises(SceneParseError, match="Invalid character"):
        parse_objects_native("pyramid")
    with pytest.raises(SceneParseError, match="minus sign"):
        parse_objects_native("sphere radius -")
    with pytest.raises(SceneParseError, match="radius"):
        parse_objects_native("cube radius 1")
    # line numbers survive the ABI
    with pytest.raises(SceneParseError) as e:
        parse_objects_native("sphere\n\nbogus")
    assert e.value.line == 3


def test_native_png_roundtrip(lib, tmp_path):
    from PIL import Image

    from ray_tracing_tpu.io.image import save_png

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    p = tmp_path / "native.png"
    save_png(img, p, flip_vertically=True, use_native=True)
    with Image.open(p) as im:
        back = np.asarray(im.convert("RGB"))
    expect = (img * 255).astype(np.uint8)[::-1]
    np.testing.assert_array_equal(back, expect)


def test_native_event_queue(lib):
    # inject through the test hook and pop in order (FIFO ring,
    # src/gpu_and_windowing.c:220-246 semantics)
    EVENT_EMPTY, EVENT_PRESS_W, EVENT_PRESS_SPACE = 0, 4, 2
    assert lib.rt_events_pop() == EVENT_EMPTY
    lib.rt_events_inject(EVENT_PRESS_W)
    lib.rt_events_inject(EVENT_PRESS_SPACE)
    assert lib.rt_events_pop() == EVENT_PRESS_W
    assert lib.rt_events_pop() == EVENT_PRESS_SPACE
    assert lib.rt_events_pop() == EVENT_EMPTY


def test_native_event_reader_thread(lib):
    # feed a pipe to the reader thread like a terminal
    r, w = os.pipe()
    assert lib.rt_events_start(r) == 0
    os.write(w, b"wdq")
    import time

    # generous: a pure-CPU reader thread is instant when scheduled, but the
    # suite can share one core with heavyweight sibling processes
    deadline = time.time() + 30
    got = []
    while time.time() < deadline and len(got) < 3:
        ev = lib.rt_events_pop()
        if ev:
            got.append(ev)
        else:
            time.sleep(0.01)
    lib.rt_events_stop()
    os.close(w)
    os.close(r)
    EVENT_PRESS_W, EVENT_PRESS_D, EVENT_PRESS_ESC = 4, 7, 3
    assert got == [EVENT_PRESS_W, EVENT_PRESS_D, EVENT_PRESS_ESC]


def test_native_sgr_mouse_parse(lib):
    """SGR-1006 mouse motion reports -> EVENT_MOVE_MOUSE with lazily
    fetched coordinates (the reference's MOVE_MOUSE + pop_event out-params,
    src/gpu_and_windowing.c:243-244, 266-269)."""
    import ctypes

    lib.rt_events_stop()
    while lib.rt_events_pop() != 0:
        pass
    data = b"\x1b[<35;100;50M\x1b[<35;110;45Mw\x1b[<0;5;5M"
    lib.rt_events_parse(data, len(data))
    assert lib.rt_events_pop() == 8   # motion
    assert lib.rt_events_pop() == 8   # motion
    assert lib.rt_events_pop() == 4   # 'w'
    assert lib.rt_events_pop() == 0   # press (b=0, no motion bit) ignored
    x = ctypes.c_double()
    y = ctypes.c_double()
    lib.rt_mouse_pos(ctypes.byref(x), ctypes.byref(y))
    assert (x.value, y.value) == (110.0, 45.0)
    # arrows still work through the general CSI path
    data = b"\x1b[A\x1b[D"
    lib.rt_events_parse(data, len(data))
    assert lib.rt_events_pop() == 20
    assert lib.rt_events_pop() == 22


def test_native_x10_mouse_parse(lib):
    """X10 mouse reports (ESC[M + 3 raw bytes — what ?1003h yields without
    SGR-1006 support) are consumed as mouse data; their printable payload
    bytes must not leak into the key switch (ADVICE r2: they would inject
    spurious moves or quit)."""
    import ctypes

    lib.rt_events_stop()
    while lib.rt_events_pop() != 0:
        pass
    # motion (b=35 incl bit 32) at (81, 17) — x payload byte is 'q'+32,
    # then a real 'w'; then a press report (b=0) that must be swallowed
    data = (bytes([0x1B, ord("["), ord("M"), 32 + 35, 32 + 81, 32 + 17])
            + b"w"
            + bytes([0x1B, ord("["), ord("M"), 32 + 0, 32 + 1, 32 + 1]))
    lib.rt_events_parse(data, len(data))
    assert lib.rt_events_pop() == 8   # motion
    assert lib.rt_events_pop() == 4   # the real 'w'
    assert lib.rt_events_pop() == 0   # press swallowed, payload not leaked
    x = ctypes.c_double()
    y = ctypes.c_double()
    lib.rt_mouse_pos(ctypes.byref(x), ctypes.byref(y))
    assert (x.value, y.value) == (81.0, 17.0)
