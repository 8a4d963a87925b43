import numpy as np

from realtimeobjectdetection_tpu.models import yolov3_tiny_spec
from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights
from realtimeobjectdetection_tpu.weights import (export_darknet_weights,
                                                 init_params,
                                                 load_darknet_weights,
                                                 param_count,
                                                 params_from_torch_state_dict)


def test_load_synthetic_consumes_exactly():
    spec = yolov3_tiny_spec()
    blob = synthetic_darknet_weights(spec, seed=0)
    assert len(blob) == 20 + 4 * param_count(spec)
    params, hdr = load_darknet_weights(spec, blob)
    assert hdr["major"] == 0 and hdr["seen"] == 32013312
    assert set(params) == {f"node_{n.index}" for n in spec.conv_nodes}
    # first conv: 3x3x3 -> 16, HWIO layout
    e0 = params["node_0"]
    assert e0["w"].shape == (3, 3, 3, 16)
    assert set(e0) == {"w", "bn_beta", "bn_gamma", "bn_mean", "bn_var"}
    # head conv has bias, no bn
    e15 = params["node_15"]
    assert set(e15) == {"w", "b"} and e15["w"].shape == (1, 1, 512, 255)


def test_export_round_trip_bit_exact():
    spec = yolov3_tiny_spec()
    blob = synthetic_darknet_weights(spec, seed=3)
    params, _ = load_darknet_weights(spec, blob)
    blob2 = export_darknet_weights(spec, params, seen=32013312)
    assert blob[20:] == blob2[20:]  # payload identical (header differs)
    params2, _ = load_darknet_weights(spec, blob2)
    for k in params:
        for f in params[k]:
            np.testing.assert_array_equal(params[k][f], params2[k][f])


def test_slice_order_matches_reference_loader():
    """First-conv slices land where the reference loader puts them.

    Reference order per BN conv (src/darknet.py:368-395):
    [beta, gamma, mean, var] then OIHW kernels.
    """
    spec = yolov3_tiny_spec()
    blob = synthetic_darknet_weights(spec, seed=0)
    flat = np.frombuffer(blob[20:], dtype=np.float32)
    params, _ = load_darknet_weights(spec, blob)
    e0 = params["node_0"]
    np.testing.assert_array_equal(e0["bn_beta"], flat[0:16])
    np.testing.assert_array_equal(e0["bn_gamma"], flat[16:32])
    np.testing.assert_array_equal(e0["bn_mean"], flat[32:48])
    np.testing.assert_array_equal(e0["bn_var"], flat[48:64])
    w_oihw = flat[64:64 + 16 * 3 * 3 * 3].reshape(16, 3, 3, 3)
    np.testing.assert_array_equal(e0["w"], w_oihw.transpose(2, 3, 1, 0))


def test_torch_state_dict_conversion():
    spec = yolov3_tiny_spec()
    ref = init_params(spec, seed=1)
    # build a reference-schema state dict from our params (OIHW tensors)
    sd = {}
    for node in spec.conv_nodes:
        i = node.index
        entry = ref[f"node_{i}"]
        sd[f"module_list.{i}.conv_{i}.weight"] = \
            entry["w"].transpose(3, 2, 0, 1)
        if node.batch_normalize:
            sd[f"module_list.{i}.batch_norm_{i}.weight"] = entry["bn_gamma"]
            sd[f"module_list.{i}.batch_norm_{i}.bias"] = entry["bn_beta"]
            sd[f"module_list.{i}.batch_norm_{i}.running_mean"] = entry["bn_mean"]
            sd[f"module_list.{i}.batch_norm_{i}.running_var"] = entry["bn_var"]
        else:
            sd[f"module_list.{i}.conv_{i}.bias"] = entry["b"]
    out = params_from_torch_state_dict(spec, sd)
    for k in ref:
        for f in ref[k]:
            np.testing.assert_array_equal(out[k][f], ref[k][f])

    # DataParallel prefix handling
    sd_dp = {f"module.{k}": v for k, v in sd.items()}
    out_dp = params_from_torch_state_dict(spec, sd_dp)
    np.testing.assert_array_equal(out_dp["node_0"]["w"], ref["node_0"]["w"])
