"""Interactive terminal chatbot (reference example_chatbot.py): fixed
persona prompt, streaming token-by-token output, break-on-newline, and
rewind when the model tries to speak for the user."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from examples.common import build_from_args
from exllama_tpu.generator import ExLlamaGenerator


def extra(parser):
    parser.add_argument("-un", "--username", default="User")
    parser.add_argument("-bn", "--botname", default="Chatbort")
    parser.add_argument("-p", "--prompt_file", default=None,
                        help="file with the initial persona prompt")
    parser.add_argument("-nnl", "--no_newline", action="store_true",
                        help="don't break responses on newline")


args, cfg, model, tokenizer, cache = build_from_args("chatbot",
                                                     extra_args=extra)
generator = ExLlamaGenerator(model, tokenizer, cache)
generator.settings.temperature = 0.95
generator.settings.top_k = 20
generator.settings.top_p = 0.65
generator.settings.token_repetition_penalty_max = 1.15
generator.settings.token_repetition_penalty_sustain = cfg.max_seq_len // 2

user, bot = args.username, args.botname
if args.prompt_file:
    with open(args.prompt_file) as f:
        past = f.read().replace("{username}", user).replace("{bot_name}", bot)
else:
    past = (
        f"This is a conversation between {user} and a curious chatbot "
        f"named {bot}.\n"
    )

ids = tokenizer.encode(past)
generator.gen_begin(ids)
print(past, end="", flush=True)

break_on_newline = not args.no_newline
max_response_tokens = 256

while True:
    try:
        line = input(f"{user}: ").strip()
    except (EOFError, KeyboardInterrupt):
        print()
        break
    if line in ("quit", "exit"):
        break

    generator.gen_feed_tokens(tokenizer.encode(f"{user}: {line}\n{bot}:"))
    print(f"{bot}:", end="", flush=True)

    res_line = f"{bot}:"
    num_res_tokens = 0
    for _ in range(max_response_tokens):
        token = generator.gen_single_token()
        tid = int(token[0, 0])
        num_res_tokens += 1
        prev = res_line
        res_line = f"{bot}:" + tokenizer.decode(
            generator.sequence_actual[0, -num_res_tokens:]
        )
        new_text = res_line[len(prev):]
        print(new_text, end="", flush=True)

        if tid == tokenizer.eos_token_id:
            break
        if break_on_newline and tid == tokenizer.newline_token_id:
            break
        # model tries to take over the user's turn → rewind its attempt
        # (reference example_chatbot.py:231-235)
        if res_line.endswith(f"{user}:"):
            plen = tokenizer.encode(f"{user}:").shape[-1]
            generator.gen_rewind(plen)
            print("\r" + " " * len(res_line) + "\r", end="")
            break
    print()
