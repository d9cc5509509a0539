from .pointops import (
    square_distance,
    index_points,
    gather_operation,
    group_operation,
    knn_point,
    three_nn,
    three_interpolate,
    farthest_point_sample,
    query_ball_point,
    sample_and_group_all,
)
