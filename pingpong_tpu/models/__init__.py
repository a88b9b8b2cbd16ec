from pingpong_tpu.models.noisy import (
    DenseParams,
    NoisyNoise,
    NoisyParams,
    dense_apply,
    dense_init,
    noisy_apply,
    noisy_init,
    sample_noise,
)
from pingpong_tpu.models.qnet import (
    QNetNoise,
    QNetParams,
    qnet_apply,
    qnet_greedy_action,
    qnet_init,
    qnet_sample_noise,
)
from pingpong_tpu.models.qnet_rnn import (
    Hidden,
    LSTMLayerParams,
    QNetRNNNoise,
    QNetRNNParams,
    init_hidden,
    lstm_cell,
    qnet_rnn_apply,
    qnet_rnn_init,
    qnet_rnn_sample_noise,
    qnet_rnn_step,
)
from pingpong_tpu.models.policy import (
    ball_follower_action,
    epsilon_greedy,
    qnet_act_greedy,
    qnet_act_train,
    rnn_act_greedy,
    rnn_act_train,
)
