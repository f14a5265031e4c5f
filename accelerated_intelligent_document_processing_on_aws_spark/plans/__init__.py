from .inspect import (  # noqa: F401
    assert_scale_safe,
    codegen_op_fraction,
    exchange_count,
    n_ops,
    op_names,
    plan_of,
    plan_report,
    pushed_filters,
    python_eval_ops,
    read_schemas,
)
