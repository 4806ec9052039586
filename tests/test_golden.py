"""Golden-image parity vs the reference C++ renderer.

Goldens in tests/goldens/ were produced by the reference build (see
tools/make_goldens.py) with its default material model (MtlBlinn_PhotonMap,
usePhotonMap=false) at 200x150. Our photonmap integrator renders the same
scenes at the same spp; images are compared after 10x10 block-averaging to
integrate away the independent MC noise of the two renderers (the reference
RNG is time-seeded; bitwise parity is impossible by design — SURVEY.md §7).

Tolerances are per-scene: diffuse-only scenes converge tightly; glass/glossy
scenes carry more variance at the golden's spp.
"""

import os

import numpy as np
import pytest

from qaray_tpu.renderer import Renderer, RendererParam
from qaray_tpu.scene.xml_parser import load_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# Representative scenes promoted to the `golden_core` middle tier
# (everything else in CASES runs in the `slow` full sweep): one basic
# analytic scene, the bench-primary box, and one glass/RR scene. The mesh,
# feature (spot), variant, and photon goldens below are core-marked too.
GOLDEN_CORE_SCENES = {
    "example_project2_blinn.xml",
    "example_project3_box.xml",
    "trc_mtl_glass.xml",
}
# (The photon-map golden and the 64-spp integrator variants proved too
# heavy for the <10-min warm budget on this 2-core host and live in the
# slow / default tiers instead.)

CASES = [
    # (scene, spp, block-mean tolerance)
    # trc_scene_*: spot lights + partial assets (OBJs missing upstream —
    # both renderers skip them identically).
    ("trc_scene_simple.xml", 16, 0.02),
    ("trc_scene_tower.xml", 16, 0.03),
    ("example_project2_blinn.xml", 16, 0.015),
    ("example_project3_box.xml", 16, 0.02),
    ("example_project3_sphere.xml", 16, 0.02),
    ("example_project4.xml", 16, 0.02),
    ("trc_mtl_glass.xml", 32, 0.035),
    ("trc_mtl_glossy.xml", 32, 0.035),
    ("trc_mtl_coffee.xml", 32, 0.035),
    # Full-coverage sweep over every remaining inputs/ scene (OBJ meshes and
    # texture PNGs are missing upstream; both renderers skip them the same
    # way, so these exercise each scene's remaining geometry/lights/
    # materials). Tolerances: diffuse-dominated scenes sit ~0.01, glass/GI
    # scenes carry more MC variance at the golden's spp.
    ("example_project5_low.xml", 16, 0.03),
    ("example_project5_high.xml", 16, 0.03),
    ("example_project6.xml", 16, 0.03),
    ("example_project7_checkboard.xml", 16, 0.03),
    ("example_project7_object.xml", 16, 0.03),
    ("example_project9.xml", 32, 0.03),
    ("example_project10_banana.xml", 16, 0.03),
    ("example_project10_objects.xml", 16, 0.03),
    ("example_project10_test.xml", 16, 0.03),
    ("example_project11_box.xml", 32, 0.04),
    ("example_project11_caustics.xml", 32, 0.04),
    ("example_project11_teapot.xml", 32, 0.04),
    ("example_project12_box.xml", 32, 0.04),
    ("example_project12_caustics_glossy.xml", 32, 0.04),
    ("example_project12_caustics_perfect.xml", 32, 0.04),
    ("example_project12_example.xml", 32, 0.04),
    ("example_project13_example.xml", 32, 0.04),
    ("trc_scene_xmas.xml", 16, 0.03),
]


def _load_png(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _block_mean(img, b=10):
    h, w = img.shape[:2]
    return img[: h // b * b, : w // b * b].reshape(
        h // b, b, w // b, b, 3
    ).mean(axis=(1, 3))


def _render_ours(inputs_dir, scene_name, spp):
    scene = load_scene(f"{inputs_dir}/{scene_name}")
    scene.camera.img_width = 200
    scene.camera.img_height = 150
    p = RendererParam(spp_min=spp, spp_max=spp, integrator="photonmap")
    r = Renderer(p)
    r.compute_scene(scene)
    fb = r.render()
    return fb.img.reshape(150, 200, 3).astype(np.float32) / 255.0


@pytest.mark.golden_core
def test_mesh_scene_golden():
    """Mesh path (OBJ load + BVH + smooth normals) vs the reference.

    Golden from the reference's Debug build — its optimized builds crash on
    every multi-triangle mesh (TriFace::operator= misses `return *this`,
    mesh/TriMesh.h:58-67, UB the face sort trips over at -O3).
    """
    golden_path = os.path.join(GOLDEN_DIR, "mesh_scene_16spp.png")
    if not os.path.exists(golden_path):
        pytest.skip("mesh golden missing")
    assets = os.path.join(os.path.dirname(__file__), "assets")
    golden = _load_png(golden_path)
    ours = _render_ours(assets, "mesh_scene.xml", 16)
    diff = np.abs(_block_mean(golden) - _block_mean(ours))
    assert diff.mean() < 0.015, f"mesh diff {diff.mean():.4f}"


@pytest.mark.parametrize(
    "name,spp,tol",
    [
        # Spot-light cone attenuation + default (1,0,0) direction semantics.
        pytest.param("spot_scene", 16, 0.01, marks=pytest.mark.golden_core),
        # Area-light adaptive soft shadows (exact 16->64 escalating
        # recurrence with in-loop falloff) + depth-of-field lens sampling.
        ("softdof_scene", 32, 0.02),
    ],
)
def test_feature_scene_golden(name, spp, tol):
    golden_path = os.path.join(GOLDEN_DIR, f"{name}_{spp}spp.png")
    if not os.path.exists(golden_path):
        pytest.skip(f"{name} golden missing")
    assets = os.path.join(os.path.dirname(__file__), "assets")
    golden = _load_png(golden_path)
    ours = _render_ours(assets, f"{name}.xml", spp)
    diff = np.abs(_block_mean(golden) - _block_mean(ours))
    assert diff.mean() < tol, f"{name} diff {diff.mean():.4f}"


@pytest.mark.slow
def test_photon_map_golden(inputs_dir):
    """Full photon-mapping pipeline vs the reference with -use-photon-map:
    emission + RR scatter + caustics gating + quadratic-filter gathering.
    Both sides build independent random photon maps, so the comparison
    carries map-level estimator noise on top of pixel MC noise — the 0.06
    tolerance reflects that (block-mean observed ~0.035 at 16spp/10k
    photons; images share the caustic ring structure)."""
    golden_path = os.path.join(GOLDEN_DIR, "trc_mtl_glass_photonmap_16spp.png")
    if not os.path.exists(golden_path):
        pytest.skip("photon golden missing")
    from qaray_tpu.renderer import Renderer, RendererParam

    scene = load_scene(f"{inputs_dir}/trc_mtl_glass.xml")
    scene.camera.img_width = 200
    scene.camera.img_height = 150
    p = RendererParam(
        spp_min=16, spp_max=16, integrator="photonmap", use_photon_map=True
    )
    r = Renderer(p)
    r.compute_scene(scene)
    fb = r.render()
    ours = fb.img.reshape(150, 200, 3).astype(np.float32) / 255.0
    golden = _load_png(golden_path)
    diff = np.abs(_block_mean(golden) - _block_mean(ours))
    assert diff.mean() < 0.06, f"photon diff {diff.mean():.4f}"


def test_texture_filter_golden():
    """Checkerboard minification: validates the 32-sample elliptic footprint
    filter driven by primary-ray differentials (reference
    core/texture.cpp:32-52 + objects.cpp diff-hit blocks)."""
    golden_path = os.path.join(GOLDEN_DIR, "texture_scene_16spp.png")
    if not os.path.exists(golden_path):
        pytest.skip("texture golden missing")
    assets = os.path.join(os.path.dirname(__file__), "assets")
    golden = _load_png(golden_path)
    ours = _render_ours(assets, "texture_scene.xml", 16)
    diff = np.abs(_block_mean(golden) - _block_mean(ours))
    assert diff.mean() < 0.01, f"texture diff {diff.mean():.4f}"


VARIANT_CASES = [
    # (scene, spp, integrator, tol) — goldens from reference builds with the
    # MtlBlinn alias switched (tools/build_reference_variant.sh), so the
    # Basic and MonteCarloGI integrators are validated against the actual
    # reference algorithms, not just smoke-tested. Tolerances reflect the
    # documented estimator deviation (branching recursion re-expressed as
    # luma RR — equal in expectation) plus MC noise at 64spp.
    ("example_project2_blinn.xml", 64, "basic", 0.02),
    ("example_project3_box.xml", 64, "basic", 0.025),
    ("example_project3_box.xml", 64, "mcgi", 0.03),
]


@pytest.mark.parametrize("scene_name,spp,integ,tol", VARIANT_CASES)
def test_integrator_variant_golden(inputs_dir, scene_name, spp, integ, tol):
    golden_path = os.path.join(
        GOLDEN_DIR, scene_name.replace(".xml", f"_{integ}_{spp}spp.png")
    )
    if not os.path.exists(golden_path):
        pytest.skip(f"golden missing: {golden_path}")
    golden = _load_png(golden_path)
    scene = load_scene(f"{inputs_dir}/{scene_name}")
    scene.camera.img_width = 200
    scene.camera.img_height = 150
    p = RendererParam(spp_min=spp, spp_max=spp, integrator=integ)
    r = Renderer(p)
    r.compute_scene(scene)
    fb = r.render()
    ours = fb.img.reshape(150, 200, 3).astype(np.float32) / 255.0
    diff = np.abs(_block_mean(golden) - _block_mean(ours))
    assert diff.mean() < tol, f"{integ} diff {diff.mean():.4f}"


HIGH_SPP_CASES = [
    # (scene, spp, pixel_exact) — goldens from tools/make_highspp_goldens.py.
    # `-spp N` pins sppMin == sppMax in the reference (main.cpp:21-24), so
    # both renderers integrate exactly N samples/pixel and the comparison is
    # an estimator-parity test. pixel_exact marks scenes whose MC noise
    # floor at that spp supports the raw per-pixel 0.005 bar; the
    # glass/xmas scenes are still visibly noise-dominated at their spp
    # (per-pixel diff matches the sqrt(2)*sigma prediction exactly), so for
    # them the bias is asserted through the noise-cancelling statistics:
    # signed per-channel mean (catches any brightness skew at the 0.15%
    # level), 10x10 block means, and the per-pixel sigma-consistency test.
    ("example_project3_box.xml", 1024, True),
    ("trc_mtl_glass.xml", 512, False),
    ("trc_scene_xmas.xml", 256, False),
]


@pytest.mark.slow
@pytest.mark.parametrize("scene_name,spp,pixel_exact", HIGH_SPP_CASES)
def test_high_spp_parity(inputs_dir, scene_name, spp, pixel_exact):
    """BASELINE.md correctness bar at matched high sample counts: per-pixel
    sRGB agreement where the noise floor allows, signed-bias + block-mean +
    sigma-consistency everywhere (fb.color_std holds the reference's own
    incremental sample-variance recurrence, scene/scene.cpp:113-123)."""
    golden_path = os.path.join(
        GOLDEN_DIR, scene_name.replace(".xml", f"_{spp}spp.png")
    )
    if not os.path.exists(golden_path):
        pytest.skip(f"golden missing: {golden_path}")
    golden = _load_png(golden_path)  # sRGB in [0,1]

    scene = load_scene(f"{inputs_dir}/{scene_name}")
    scene.camera.img_width = 200
    scene.camera.img_height = 150
    p = RendererParam(spp_min=spp, spp_max=spp, integrator="photonmap")
    r = Renderer(p)
    r.compute_scene(scene)
    fb = r.render()
    ours = fb.img.reshape(150, 200, 3).astype(np.float32) / 255.0

    diff = np.abs(golden - ours)
    if pixel_exact:
        assert diff.mean() <= 0.005, (
            f"{scene_name}@{spp}spp: per-pixel sRGB mean abs diff "
            f"{diff.mean():.5f} > 0.005"
        )
    # Estimator bias: the signed mean over 30k pixels cancels independent MC
    # noise ~170x, so a fraction-of-a-percent brightness skew in any channel
    # fails loudly (measured |bias| < 0.0005 on all three scenes).
    bias = (ours - golden).mean(axis=(0, 1))
    assert np.abs(bias).max() <= 0.0015, (
        f"{scene_name}@{spp}spp: signed per-channel bias {bias} exceeds 0.0015"
    )
    block_diff = np.abs(_block_mean(golden) - _block_mean(ours)).mean()
    assert block_diff <= 0.0065, (
        f"{scene_name}@{spp}spp: 10x10 block-mean diff {block_diff:.5f}"
    )

    # Sigma-consistency: |ours - ref| per pixel vs the MC std of the mean.
    # var(mean) = color_std / spp per renderer; the reference's estimator is
    # the same so the difference's variance is ~2x ours. Push through the
    # sRGB derivative, add the golden's 8-bit quantization floor, and
    # require <1% of pixels beyond 4 sigma (a few-percent brightness skew in
    # any lobe would blow this up).
    from qaray_tpu.fb.framebuffer import linear_to_srgb_np

    lin = fb.mean.reshape(150, 200, 3)
    var_mean = fb.color_std.reshape(150, 200, 3) / spp
    eps = 1e-4
    dsrgb = (
        linear_to_srgb_np(np.clip(lin + eps, 0, None))
        - linear_to_srgb_np(np.clip(lin, 0, None))
    ) / eps
    sigma_srgb = np.abs(dsrgb) * np.sqrt(2.0 * np.maximum(var_mean, 0.0))
    quant = 2.0 / 255.0  # golden + ours 8-bit rounding
    sigma_eff = np.sqrt(sigma_srgb**2 + quant**2)
    frac_bad = (diff > 4.0 * sigma_eff).mean()
    # Gaussian tails would put <0.01% beyond 4 sigma; path-traced pixel
    # estimators are heavy-tailed (glass/caustic spikes), measured ~2% on
    # the glass/xmas scenes with ZERO mean bias — so the bound is 1% for
    # the smooth diffuse scene and 3% for the spiky ones. A systematic
    # estimator error shows up as bias/block failures above, not here.
    bound = 0.01 if pixel_exact else 0.03
    assert frac_bad < bound, (
        f"{scene_name}@{spp}spp: {frac_bad:.2%} of pixels beyond 4 sigma"
    )


@pytest.mark.parametrize(
    "scene_name,spp,tol",
    [
        pytest.param(
            n, s, t,
            marks=(
                pytest.mark.golden_core
                if n in GOLDEN_CORE_SCENES
                else pytest.mark.slow
            ),
            id=f"{n}-{s}spp",
        )
        for n, s, t in CASES
    ],
)
def test_golden_parity(inputs_dir, scene_name, spp, tol):
    golden_path = os.path.join(
        GOLDEN_DIR, scene_name.replace(".xml", f"_{spp}spp.png")
    )
    if not os.path.exists(golden_path):
        pytest.skip(f"golden missing: {golden_path}")
    golden = _load_png(golden_path)
    ours = _render_ours(inputs_dir, scene_name, spp)
    diff = np.abs(_block_mean(golden) - _block_mean(ours))
    mean_diff = diff.mean()
    p95 = np.percentile(diff, 95)
    assert mean_diff < tol, (
        f"{scene_name}: block-mean diff {mean_diff:.4f} (p95 {p95:.4f}) "
        f"exceeds {tol}"
    )
