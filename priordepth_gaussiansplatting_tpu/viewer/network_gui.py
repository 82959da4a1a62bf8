"""SIBR remote-viewer socket protocol — byte-compatible server.

Re-implements the reference `gaussian_renderer/network_gui.py:26-86` +
`train.py:103-119` loop so the prebuilt SIBR_remoteGaussian_app can connect
unchanged: a non-blocking TCP listener; requests are 4-byte little-endian
length-prefixed JSON carrying a camera (torch row-vector convention matrices,
with columns 1/2 sign-flipped) and control flags; responses are raw H×W×3
uint8 RGB followed by a length-prefixed verify string (the training source
path).
"""

from __future__ import annotations

import json
import socket
import traceback
from dataclasses import replace

import jax.numpy as jnp
import numpy as np

from ..core.cameras import Camera
from ..ops.render import render as render_fn


def _single_device(state):
    """Gather a (possibly mesh-sharded) GaussianState onto the default
    device: the per-view GUI render is written for unsharded state, and an
    interactive poll shouldn't lean on implicit GSPMD resharding of a
    multi-device pytree."""
    import jax

    leaves = jax.tree.leaves(state)
    if not any(getattr(x, "sharding", None) is not None
               and len(x.sharding.device_set) > 1 for x in leaves):
        return state
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), state)


def _decode_camera(message) -> Camera | None:
    width = message["resolution_x"]
    height = message["resolution_y"]
    if width == 0 or height == 0:
        return None
    view = np.array(message["view_matrix"], np.float32).reshape(4, 4)
    view[:, 1] = -view[:, 1]
    view[:, 2] = -view[:, 2]
    proj = np.array(message["view_projection_matrix"],
                    np.float32).reshape(4, 4)
    proj[:, 1] = -proj[:, 1]
    # The wire format is torch row-vector convention; ours is column-vector.
    w2c = view.T
    full = proj.T
    cam_center = np.linalg.inv(w2c)[:3, 3]
    return Camera(
        world_view=jnp.asarray(w2c), full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(cam_center),
        height=int(height), width=int(width),
        fovx=float(message["fov_x"]), fovy=float(message["fov_y"]),
        znear=float(message["z_near"]), zfar=float(message["z_far"]))


class NetworkGUI:
    """Non-blocking remote-render server polled from the train loop."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn = None

    def _try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nGUI connected by {addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _read(self):
        length = int.from_bytes(self.conn.recv(4), "little")
        payload = b""
        while len(payload) < length:
            chunk = self.conn.recv(length - len(payload))
            if not chunk:
                raise ConnectionError("GUI closed")
            payload += chunk
        return json.loads(payload.decode("utf-8"))

    def _send(self, image_bytes, verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def poll(self, state, bg, training_done: bool = False,
             source_path: str = "") -> bool:
        """One poll step; mirrors `train.py:103-119`. Returns whether
        training should continue (the GUI can pause it)."""
        if self.conn is None:
            self._try_connect()
        keep_training = True
        while self.conn is not None:
            try:
                message = self._read()
                cam = _decode_camera(message)
                do_training = bool(message.get("train", True))
                keep_alive = bool(message.get("keep_alive", False))
                scaling_mod = float(message.get("scaling_modifier", 1.0))
                image_bytes = None
                if cam is not None:
                    state = _single_device(state)
                    out = render_fn(cam, state, jnp.asarray(bg),
                                    scaling_modifier=scaling_mod)
                    img = np.asarray(
                        jnp.clip(out["render"], 0, 1) * 255
                    ).astype(np.uint8).transpose(1, 2, 0)
                    image_bytes = memoryview(np.ascontiguousarray(img))
                self._send(image_bytes, source_path)
                keep_training = do_training
                if do_training and (not keep_alive or training_done):
                    break
            except Exception:
                if self.conn is not None:
                    try:
                        self.conn.close()
                    except OSError:
                        pass
                self.conn = None
                traceback.print_exc()
        return keep_training

    def close(self):
        if self.conn is not None:
            self.conn.close()
        self.listener.close()
