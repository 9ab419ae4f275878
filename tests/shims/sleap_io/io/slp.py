def read_labels(path):
    raise NotImplementedError(
        "sleap_io shim: .slp reading is not exercised by the parity suite "
        "(use eks_tpu.utils.io.convert_slp_dlc for first-party .slp support)"
    )
