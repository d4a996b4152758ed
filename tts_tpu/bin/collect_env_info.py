"""Print environment info for bug reports (reference ``TTS/bin/collect_env_info.py``)."""

import json
import platform
import sys


def system_info():
    import jax

    import tts_tpu

    try:
        devices = [str(d) for d in jax.devices()]
    except Exception as e:  # no accelerator
        devices = [f"unavailable: {e}"]
    return {
        "tts_tpu": tts_tpu.__version__,
        "jax": jax.__version__,
        "python": sys.version,
        "platform": platform.platform(),
        "devices": devices,
    }


def main():
    print(json.dumps(system_info(), indent=2))


if __name__ == "__main__":
    main()
