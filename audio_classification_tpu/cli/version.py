"""Environment sanity print (reference: scripts/version.py)."""
from __future__ import annotations

import sys


def main(argv=None):
    import numpy

    import audio_classification_tpu as act

    print(f"python          : {sys.version.split()[0]}")
    print(f"framework       : audio_classification_tpu {act.__version__}")
    print(f"numpy           : {numpy.__version__}")
    try:
        import jax

        print(f"jax             : {jax.__version__}")
        print(f"devices         : {jax.devices()}")
        print(f"default backend : {jax.default_backend()}")
    except Exception as e:  # pragma: no cover
        print(f"jax             : unavailable ({e})")
    try:
        import flax
        import optax

        print(f"flax            : {flax.__version__}")
        print(f"optax           : {optax.__version__}")
    except Exception:
        pass
    from ..audio_io.wav import _native_lib

    print(f"native wavcodec : {'loaded' if _native_lib() is not None else 'numpy fallback'}")


if __name__ == "__main__":
    main()
