from .rpn import RPN, RPNHead  # noqa: F401
