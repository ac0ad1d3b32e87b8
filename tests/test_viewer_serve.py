"""Built-in interactive web viewer (SURVEY #3): PLY round-trip + HTTP
render endpoint for every mode."""

import threading
import urllib.request

import numpy as np
import pytest

from siu3r_tpu.cli.viewer import (
    camera_from_spherical,
    load_gaussian_ply,
    render_views,
    serve,
)
from siu3r_tpu.io import export_ply


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("viewer")
    rng = np.random.RandomState(0)
    g, q, c = 64, 4, 21
    means = rng.randn(g, 3).astype(np.float32) * 0.3
    scales = np.full((g, 3), 0.05, np.float32)
    rot = np.zeros((g, 4), np.float32)
    rot[:, 0] = 1.0  # xyzw identity? exporter takes xyzw per schema
    harmonics = np.zeros((g, 3, 25), np.float32)
    harmonics[:, :, 0] = rng.rand(g, 3)
    export_ply(
        means=means, scales=scales, rotations=np.roll(rot, -1, axis=-1),
        harmonics=harmonics, opacities=rng.rand(g).astype(np.float32),
        semantic_labels=rng.randint(0, 20, g),
        instance_labels=rng.randint(0, 5, g),
        seg_query_class_logits=rng.rand(g, q, c).astype(np.float32),
        path=tmp / "output.ply",
    )
    return load_gaussian_ply(tmp / "output.ply")


def test_scene_roundtrip(scene):
    assert scene["means"].shape == (64, 3)
    assert scene["qc"] is not None and scene["qc"].shape == (64, 4, 21)


@pytest.mark.parametrize("mode", ["rgb", "semantic", "instance", "depth"])
def test_render_modes(scene, mode):
    vm, intr = camera_from_spherical(
        np.zeros(3), yaw=0.3, pitch=0.2, radius=2.0, image_size=(64, 64)
    )
    img = render_views(scene, vm[None], intr[None], (64, 64), mode=mode)[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8


def test_http_server_serves_page_and_frames(scene):
    server = serve(scene, port=0, image_size=(64, 64), block=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{server.server_port}"
        html = urllib.request.urlopen(f"{base}/", timeout=30).read()
        assert b"siu3r_tpu viewer" in html
        png = urllib.request.urlopen(
            f"{base}/render?yaw=0.5&pitch=0.1&radius=1.2&mode=semantic",
            timeout=120,
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert (
            urllib.request.urlopen(f"{base}/nope", timeout=30).status
        )
    except urllib.error.HTTPError as e:
        assert e.code == 404  # the /nope probe
    finally:
        server.shutdown()
