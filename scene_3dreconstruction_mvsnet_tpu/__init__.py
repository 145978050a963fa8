"""scene_3dreconstruction_mvsnet_tpu — a TPU-native MVSNet 3D-reconstruction framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
olivier-2018/scene_3Dreconstruction_MVSNet (PyTorch): MVSNet depth inference
(feature extraction -> differentiable plane-sweep homography -> variance cost
volume -> 3D U-Net regularization -> softmax depth regression), training,
evaluation with photometric/geometric consistency filtering, and point-cloud
fusion — all designed TPU-first:

 - compute path is jit-compiled XLA with NHWC/NDHWC layouts for the MXU,
 - the plane sweep streams views through a `lax.scan` so only one warped
   volume is live at a time (HBM friendly),
 - depth regression + photometric confidence are fused into a single Pallas
   kernel on TPU,
 - scaling is expressed with `jax.sharding.Mesh` + sharding constraints
   (data / depth-plane / spatial axes); XLA inserts the ICI collectives,
 - eval-time geometric filtering runs on-device (the reference does it on
   CPU with numpy/cv2; see /root/reference/eval.py:508-585).
"""

__version__ = "0.1.0"
