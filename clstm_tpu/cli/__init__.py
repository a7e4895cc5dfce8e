"""CLI entry points (reference clstmocrtrain/clstmocr/clstmfiltertrain/
clstmfilter; SURVEY.md §2 L7). Config is environment variables, exactly as
in the reference: ``lrate=1e-4 nhidden=100 save_name=model clstmocrtrain
train.files [test.files]``."""
