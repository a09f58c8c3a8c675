"""Shared helper: rebuild the reference's TF1 encoder/decoder graph shape
(auto_pose/ae/encoder.py:38-68, decoder.py:36-84) with raw tf.nn ops but
tf.layers' VARIABLE NAMES ('conv2d/kernel', 'conv2d_1/...', 'dense/...') —
exactly what reference checkpoints contain. tf.layers itself is gone under
Keras 3, so the graph is re-derived, not imported."""

import numpy as np
import tensorflow as _tf

tf = _tf.compat.v1

_counters = {}


def _auto_name(base):
    i = _counters.get(base, 0)
    _counters[base] = i + 1
    return base if i == 0 else f"{base}_{i}"


def _conv2d(x, filters, stride, activation, kernel=5):
    name = _auto_name("conv2d")
    with tf.variable_scope(name):
        k = tf.get_variable(
            "kernel", [kernel, kernel, int(x.shape[-1]), filters],
            initializer=tf.glorot_uniform_initializer(),
        )
        b = tf.get_variable("bias", [filters], initializer=tf.zeros_initializer())
    y = tf.nn.conv2d(x, k, strides=[1, stride, stride, 1], padding="SAME") + b
    return activation(y) if activation is not None else y


def _dense(x, units, activation=None):
    name = _auto_name("dense")
    with tf.variable_scope(name):
        k = tf.get_variable(
            "kernel", [int(x.shape[-1]), units],
            initializer=tf.glorot_uniform_initializer(),
        )
        b = tf.get_variable("bias", [units], initializer=tf.zeros_initializer())
    y = tf.matmul(x, k) + b
    return activation(y) if activation is not None else y


def build_reference_graph(x, filters, strides, latent, h, w, kernel=5):
    """Returns (z, reconstruction) tensors for input placeholder x."""
    _counters.clear()
    net = x
    for f, s in zip(filters, strides):
        net = _conv2d(net, f, s, tf.nn.relu, kernel=kernel)
    net = tf.reshape(net, [-1, int(np.prod(net.shape[1:]))])
    z = _dense(net, latent)

    rfilters = list(reversed(filters))
    rstrides = list(reversed(strides))
    layer_dims = [
        (int(h / np.prod(rstrides[i:])), int(w / np.prod(rstrides[i:])))
        for i in range(len(rstrides))
    ]
    d = _dense(z, layer_dims[0][0] * layer_dims[0][1] * rfilters[0], tf.nn.relu)
    d = tf.reshape(d, [-1, layer_dims[0][0], layer_dims[0][1], rfilters[0]])
    for f, size in zip(rfilters[1:], layer_dims[1:]):
        d = tf.compat.v1.image.resize_nearest_neighbor(d, size)
        d = _conv2d(d, f, 1, tf.nn.relu, kernel=kernel)
    d = tf.compat.v1.image.resize_nearest_neighbor(d, [h, w])
    recon = _conv2d(d, 3, 1, tf.nn.sigmoid, kernel=kernel)
    return z, recon
