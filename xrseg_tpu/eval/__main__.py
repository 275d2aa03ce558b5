from xrseg_tpu.eval.dataset_eval import _main

if __name__ == "__main__":
    raise SystemExit(_main())
