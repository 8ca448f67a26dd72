"""IO helpers: image save, checkpoint resolution.

Capability parity with `imaginaire/utils/io.py` (image save, checkpoint
download/resolve helper). This environment has no network egress, so
`get_checkpoint` resolves local paths only and reports clearly when
asked for a remote URL.
"""
import os


def save_image(path, img_uint8_rgb):
    """uint8 HWC RGB -> PNG/JPG on disk (cv2 expects BGR)."""
    import cv2
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cv2.imwrite(path, img_uint8_rgb[..., ::-1])


def save_tensor_image(path, img):
    """[-1, 1] float HWC (or NHWC first item) -> image file."""
    import numpy as np
    from scenedreamer_tpu.utils.visualization import tensor2im
    img = np.asarray(img)
    if img.ndim == 4:
        img = img[0]
    save_image(path, tensor2im(img))


def get_checkpoint(path_or_url, checkpoint_dir='checkpoints'):
    """Resolve a checkpoint path (`utils/io.py get_checkpoint`).

    Local paths are returned as-is; URLs raise with instructions (no
    network egress in this environment — download out-of-band and pass
    the local file)."""
    if path_or_url.startswith(('http://', 'https://', 'gs://')):
        local = os.path.join(checkpoint_dir,
                             os.path.basename(path_or_url))
        if os.path.exists(local):
            return local
        raise FileNotFoundError(
            f'{path_or_url} is remote and this environment has no '
            f'network egress; place the file at {local} instead')
    if not os.path.exists(path_or_url):
        raise FileNotFoundError(path_or_url)
    return path_or_url
