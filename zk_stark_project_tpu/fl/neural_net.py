"""Fixed-point numpy 1-layer network — the *plaintext twin* of the
in-circuit training (reference `devices/middleware/neural_net.py:46-208`).

Integer-truncation semantics are preserved exactly (every `astype(int)`
truncates toward zero after a float divide): this network is what the FL
simulation trains, and its arithmetic mirrors what the training STARK proves
in the field.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def mse(y_true, y_pred, precision=1):
    return np.mean(np.power(y_true - y_pred, 2) / np.power(precision, 2))


def mse_prime(y_true, y_pred):
    return 2 * (y_pred - y_true) / y_true.size


class FCLayer:
    """`neural_net.py:46-89`: out = (x . W)/precision + b, all int-trunc."""

    def __init__(self, input_size: int, output_size: int,
                 precision: int = 10 ** 4):
        self.input_size = input_size
        self.output_size = output_size
        self.precision = precision
        self.weights: Optional[np.ndarray] = None  # stored (in, out) like ref
        self.bias: Optional[np.ndarray] = None
        self.input = None
        self.output = None

    def set_precision(self, precision: int) -> None:
        self.precision = precision

    def set_weights(self, weights) -> None:
        # reference stores the transpose of the (out, in) matrix handed in
        self.weights = np.array(weights).T

    def get_weights(self):
        return self.weights.T

    def set_bias(self, bias) -> None:
        self.bias = np.array(bias).reshape(1, -1)

    def get_bias(self):
        return self.bias.T

    def forward_propagation(self, input_data):
        self.input = input_data
        out = np.dot(self.input, self.weights) / self.precision + self.bias
        self.output = out.astype(int)
        return self.output

    def backward_propagation(self, output_error, learning_rate):
        input_error = (np.dot(output_error, self.weights.T)
                       / self.precision).astype(int)
        weights_error = (np.outer(self.input.T, output_error)
                         / self.precision).astype(int)
        self.weights = self.weights - (weights_error / learning_rate).astype(int)
        self.bias = self.bias - (output_error / learning_rate).astype(int)
        return input_error


class Network:
    """`neural_net.py:109-208`."""

    def __init__(self, output_dimension: int, input_dimension: int,
                 precision: int,
                 rng: Optional[np.random.Generator] = None):
        self.layers: List[FCLayer] = []
        self.input_dimension = input_dimension
        self.output_dimension = output_dimension
        self.precision = precision
        self.mse_average = None
        self.rng = rng if rng is not None else np.random.default_rng()

    def add_fc_layer(self) -> None:
        """Random-int init in [-precision, precision) (`neural_net.py:122-132`)."""
        layer = FCLayer(self.input_dimension, self.output_dimension,
                        self.precision)
        weights = self.rng.integers(
            -self.precision, self.precision,
            size=(self.output_dimension, self.input_dimension))
        bias = self.rng.integers(-self.precision, self.precision,
                                 size=(self.output_dimension,))
        layer.set_weights(weights)
        layer.set_bias(bias)
        self.layers.append(layer)

    def set_weights(self, w):
        for l in self.layers:
            l.set_weights(w)

    def set_bias(self, b):
        for l in self.layers:
            l.set_bias(b)

    def get_weights(self):
        return self.layers[0].get_weights()

    def get_bias(self):
        return self.layers[0].get_bias()

    def set_precision(self, precision: int):
        self.precision = precision
        for l in self.layers:
            l.set_precision(precision)

    def predict(self, input_data) -> List[int]:
        """argmax + 1 class ids (`neural_net.py:141-155`)."""
        x = (np.asarray(input_data) * self.precision).astype(int)
        result = []
        for row in x:
            out = row
            for l in self.layers:
                out = l.forward_propagation(out)
            result.append(int(np.argmax(out)) + 1)
        return result

    def fit(self, x_train, y_train, epochs: int, learning_rate) -> None:
        """`neural_net.py:184-208`."""
        samples = len(x_train)
        for _ in range(epochs):
            err = 0.0
            for j in range(samples):
                out = (np.asarray(x_train[j]) * self.precision).astype(int)
                y_true = np.zeros(self.output_dimension)
                y_true[int(y_train[j]) - 1] = self.precision
                for l in self.layers:
                    out = l.forward_propagation(out)
                err += mse(y_true, out, precision=self.precision)
                error = mse_prime(y_true, out).astype(int)
                for l in reversed(self.layers):
                    error = l.backward_propagation(error, learning_rate)
            self.mse_average = err / samples
