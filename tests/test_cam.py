import jax.numpy as jnp
import numpy as np
import pytest

from lfvio_tpu.cam import (
    ScaramuzzaCamera,
    PinholeCamera,
    KannalaBrandtCamera,
    MeiCamera,
    camera_from_yaml,
)

REF_YAML = "/root/reference/config/mindvision/mindvision.yaml"


def mindvision_cam():
    return camera_from_yaml(REF_YAML, dtype=jnp.float64)


def test_scaramuzza_yaml_load():
    cam = mindvision_cam()
    np.testing.assert_allclose(float(cam.poly[0]), -2.445239e2)
    np.testing.assert_allclose(float(cam.inv_poly[1]), 246.746504)
    np.testing.assert_allclose(float(cam.cx), 645.107791)


def test_scaramuzza_negative_plane_lift():
    """Pixels near the outer annulus edge must lift to bearings with z<0 or
    z>0 depending on radius — the negative half-plane capability."""
    cam = mindvision_cam()
    cx, cy = float(cam.cx), float(cam.cy)
    # Small radius (inner annulus, looking "up"): poly(small rho) ~ p0 < 0 => z>0
    p_inner = jnp.asarray([cx + 170.0, cy])
    b_inner = cam.lift_sphere(p_inner)
    # Large radius (outer annulus): z < 0 (negative half-plane)
    p_outer = jnp.asarray([cx + 495.0, cy])
    b_outer = cam.lift_sphere(p_outer)
    assert float(b_inner[2]) > 0.0
    assert float(b_outer[2]) < 0.0


def test_scaramuzza_roundtrip_on_annulus():
    """project(lift(p)) == p across the annulus, including negative-z rays."""
    cam = mindvision_cam()
    rng = np.random.default_rng(0)
    cx, cy = float(cam.cx), float(cam.cy)
    r = rng.uniform(170.0, 495.0, size=256)
    ang = rng.uniform(0, 2 * np.pi, size=256)
    pix = jnp.asarray(
        np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=-1)
    )
    rays = cam.lift_sphere(pix)
    assert np.isfinite(np.asarray(rays)).all()
    pix2 = cam.space_to_plane(rays)
    err = np.linalg.norm(np.asarray(pix2 - pix), axis=-1)
    # inv_poly is a fitted inverse: sub-half-pixel round trip is what the
    # calibration promises.
    assert np.median(err) < 0.2, np.median(err)
    assert err.max() < 1.0, err.max()


def test_scaramuzza_project_scale_invariant():
    cam = mindvision_cam()
    P = jnp.asarray([0.3, -0.2, -0.5])
    np.testing.assert_allclose(
        cam.space_to_plane(P), cam.space_to_plane(4.2 * P), atol=1e-9
    )


def test_pinhole_roundtrip():
    cam = PinholeCamera(
        fx=jnp.float64(458.654), fy=jnp.float64(457.296),
        cx=jnp.float64(367.215), cy=jnp.float64(248.375),
        k1=jnp.float64(-0.28340811), k2=jnp.float64(0.07395907),
        p1=jnp.float64(0.00019359), p2=jnp.float64(1.76187114e-05),
    )  # EuRoC cam0 intrinsics (public calibration)
    rng = np.random.default_rng(1)
    pix = jnp.asarray(rng.uniform([60, 60], [690, 420], size=(128, 2)))
    rays = cam.lift_projective(pix)
    np.testing.assert_allclose(rays[..., 2], 1.0)
    pix2 = cam.space_to_plane(rays)
    np.testing.assert_allclose(pix2, pix, atol=1e-6)


def test_pinhole_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    dist = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
    cam = PinholeCamera(*[jnp.float64(v) for v in (fx, fy, cx, cy, *dist)])
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    pts = np.random.default_rng(2).uniform(-0.4, 0.4, size=(64, 3)) + [0, 0, 2.0]
    proj_cv, _ = cv2.projectPoints(
        pts.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), K, dist
    )
    proj_us = cam.space_to_plane(jnp.asarray(pts))
    np.testing.assert_allclose(proj_us, proj_cv.reshape(-1, 2), atol=1e-6)


def test_kannala_brandt_roundtrip():
    cam = KannalaBrandtCamera(
        mu=jnp.float64(190.978), mv=jnp.float64(190.973),
        u0=jnp.float64(254.931), v0=jnp.float64(256.897),
        k2=jnp.float64(0.00348238), k3=jnp.float64(0.00071503),
        k4=jnp.float64(-0.00205323), k5=jnp.float64(0.00020293),
    )  # TUM-VI 512 config (reference config/tum/tum_config.yaml)
    rng = np.random.default_rng(3)
    # Directions up to ~90deg off-axis (fisheye regime)
    theta = rng.uniform(0.05, 1.5, size=128)
    phi = rng.uniform(0, 2 * np.pi, size=128)
    P = jnp.asarray(
        np.stack(
            [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)],
            axis=-1,
        )
    )
    pix = cam.space_to_plane(P)
    P2 = cam.lift_sphere(pix)
    np.testing.assert_allclose(P2, P, atol=1e-8)


def test_kannala_brandt_matches_opencv_fisheye():
    cv2 = pytest.importorskip("cv2")
    mu, mv, u0, v0 = 190.978, 190.973, 254.931, 256.897
    k = [0.00348238, 0.00071503, -0.00205323, 0.00020293]
    cam = KannalaBrandtCamera(*[jnp.float64(v) for v in (mu, mv, u0, v0, *k)])
    K = np.array([[mu, 0, u0], [0, mv, v0], [0, 0, 1.0]])
    pts = np.random.default_rng(4).uniform(-0.8, 0.8, size=(32, 3)) + [0, 0, 1.5]
    proj_cv, _ = cv2.fisheye.projectPoints(
        pts.reshape(1, -1, 3), np.zeros(3), np.zeros(3), K, np.array(k)
    )
    proj_us = cam.space_to_plane(jnp.asarray(pts))
    np.testing.assert_allclose(proj_us, proj_cv.reshape(-1, 2), atol=1e-5)


def test_mei_roundtrip():
    cam = MeiCamera(
        xi=jnp.float64(0.9), k1=jnp.float64(-0.08), k2=jnp.float64(0.01),
        p1=jnp.float64(1e-4), p2=jnp.float64(-2e-4),
        gamma1=jnp.float64(360.0), gamma2=jnp.float64(361.0),
        u0=jnp.float64(320.0), v0=jnp.float64(240.0),
    )
    rng = np.random.default_rng(5)
    theta = rng.uniform(0.05, 1.0, size=128)
    phi = rng.uniform(0, 2 * np.pi, size=128)
    P = jnp.asarray(
        np.stack(
            [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)],
            axis=-1,
        )
    )
    pix = cam.space_to_plane(P)
    P2 = cam.lift_sphere(pix)
    np.testing.assert_allclose(P2, P, atol=1e-7)
