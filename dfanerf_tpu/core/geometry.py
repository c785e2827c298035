"""Rotation / pose / projection primitives.

Conventions follow the reference exactly:

- ``euler2rot``: R = Rx(theta) @ Ry(phi) @ Rz(psi) with the reference's
  particular sign layout (face_tracking_ba/util.py:18-46 and
  run_nerf_com_trainExpLater.py:207-232 — both identical).
- ``rot_to_euler``: the inverse used for torso pose signals
  (run_nerf_com_trainExpLater.py:182-198).
- ``proj_pts`` / ``forward_transform``: pinhole projection used by the 3DMM
  tracker and bundle adjustment (face_tracking_ba/util.py:60-77).
"""

from __future__ import annotations


import jax.numpy as jnp


def euler2rot(euler: jnp.ndarray) -> jnp.ndarray:
    """Euler angles -> rotation matrices.

    The reference builds each factor by concatenating COLUMN vectors along
    the last dim (util.py:25-39), so in row-major terms:
        Rx = [[1,0,0],[0,c,-s],[0,s,c]]
        Ry = [[c,0,s],[0,1,0],[-s,0,c]]
        Rz = [[c,s,0],[-s,c,0],[0,0,1]]

    Args:
        euler: [B, 3] (theta, phi, psi).
    Returns:
        [B, 3, 3] with R = Rx @ Ry @ Rz.
    """
    theta, phi, psi = euler[..., 0], euler[..., 1], euler[..., 2]
    one = jnp.ones_like(theta)
    zero = jnp.zeros_like(theta)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    cs, ss = jnp.cos(psi), jnp.sin(psi)
    rot_x = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, ct, -st], -1),
            jnp.stack([zero, st, ct], -1),
        ],
        -2,
    )
    rot_y = jnp.stack(
        [
            jnp.stack([cp, zero, sp], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sp, zero, cp], -1),
        ],
        -2,
    )
    rot_z = jnp.stack(
        [
            jnp.stack([cs, ss, zero], -1),
            jnp.stack([-ss, cs, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    return rot_x @ rot_y @ rot_z


def rot_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices -> Euler angles (inverse of the convention above
    as used on camera poses; run_nerf_com_trainExpLater.py:182-198).

    Args:
        R: [B, 3, 3].
    Returns:
        [B, 3] with e2 = atan2(R00, -R01), e1 = asin(-R02),
        e0 = atan2(R22, R12).
    """
    e0 = jnp.arctan2(R[..., 2, 2], R[..., 1, 2])
    e1 = jnp.arcsin(-R[..., 0, 2])
    e2 = jnp.arctan2(R[..., 0, 0], -R[..., 0, 1])
    return jnp.stack([e0, e1, e2], axis=-1)


def pose_to_euler_trans(poses: jnp.ndarray) -> jnp.ndarray:
    """[B, 4, 4] (or [B,3,4]) poses -> [B, 6] (euler, translation)."""
    e = rot_to_euler(poses[..., :3, :3])
    t = poses[..., :3, 3]
    return jnp.concatenate([e, t], axis=-1)


def rot_trans_pts(pts: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply per-batch rigid transform: R @ p + t.

    Args:
        pts: [B, N, 3]; rot: [B, 3, 3]; trans: [B, 3].
    Returns:
        [B, N, 3]
    """
    return jnp.einsum("bij,bnj->bni", rot, pts) + trans[..., None, :]


def proj_pts(
    pts_cam: jnp.ndarray, focal: jnp.ndarray, cxy: jnp.ndarray
) -> jnp.ndarray:
    """Pinhole projection of camera-space points (face_tracking_ba/
    util.py:61-70 convention: u = -f*X/Z + cx, v = f*Y/Z + cy; camera looks
    down -Z so Z is negative in front of the camera).

    Args:
        pts_cam: [B, N, 3]; focal: scalar or [B]; cxy: [2] principal point.
    Returns:
        [B, N, 3] (u, v, Z) — depth carried through like the reference.
    """
    focal = jnp.asarray(focal)
    if focal.ndim == 1:
        focal = focal[:, None]
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    u = -focal * x / z + cxy[0]
    v = focal * y / z + cxy[1]
    return jnp.stack([u, v, z], axis=-1)


def forward_transform(
    pts: jnp.ndarray,
    euler: jnp.ndarray,
    trans: jnp.ndarray,
    focal: jnp.ndarray,
    cxy: jnp.ndarray,
) -> jnp.ndarray:
    """World points -> pixel coordinates through a per-frame rigid transform
    (face_tracking_ba/util.py:72-77): project(R(euler) @ p + t)."""
    rot = euler2rot(euler)
    pts_cam = rot_trans_pts(pts, rot, trans)
    return proj_pts(pts_cam, focal, cxy)
