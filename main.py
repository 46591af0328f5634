"""Top-level launcher: ``python main.py --recommender=MF --epochs=10``.

Thin wrapper over neurec_tpu.run (parity with the reference's main.py CLI).
"""

from neurec_tpu.run import main

if __name__ == "__main__":
    main()
