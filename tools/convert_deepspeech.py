#!/usr/bin/env python
"""Convert the Mozilla DeepSpeech 0.1.0 frozen graph to the npz weight
contract of dfanerf_tpu.pipeline.audio.deepspeech.

The reference pipeline downloads deepspeech-0.1.0-models.tar.gz and runs
the .pb with TensorFlow (deepspeech_features/deepspeech_store.py). This
image has no TensorFlow, so run this script wherever TF 1.x/2.x (with
compat.v1) is available:

    python tools/convert_deepspeech.py output_graph.pb deepspeech_010.npz

Then pass the npz as PipelineAssets.deepspeech_npz.
"""

import sys

import numpy as np


def main(pb_path: str, out_path: str) -> None:
    import tensorflow as tf

    tf1 = tf.compat.v1
    with tf1.io.gfile.GFile(pb_path, "rb") as f:
        graph_def = tf1.GraphDef()
        graph_def.ParseFromString(f.read())

    consts = {}
    for node in graph_def.node:
        if node.op == "Const":
            try:
                consts[node.name] = tf.make_ndarray(node.attr["value"].tensor)
            except Exception:
                pass

    def find(*fragments):
        for name, arr in consts.items():
            if all(fr in name for fr in fragments):
                return np.asarray(arr, np.float32)
        raise KeyError(fragments)

    out = {
        "h1_w": find("h1"), "h1_b": find("b1"),
        "h2_w": find("h2"), "h2_b": find("b2"),
        "h3_w": find("h3"), "h3_b": find("b3"),
        # BasicLSTMCell fused kernel/bias (gate order i, j, f, o)
        "lstm_kernel": find("lstm", "kernel"),
        "lstm_bias": find("lstm", "bias"),
        "h5_w": find("h5"), "h5_b": find("b5"),
        "h6_w": find("h6"), "h6_b": find("b6"),
    }
    for k, v in out.items():
        print(f"{k}: {v.shape}")
    np.savez(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
