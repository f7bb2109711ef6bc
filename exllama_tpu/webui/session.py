"""Chat session engine: history nodes, persistence, context-window
management, streaming multi-participant responses.

Behavioral re-implementation of the reference's webui/session.py on top of
our generator: Node = author+text+tokens+uuid+truncate (:77-134); Session
persists generation settings + history JSON per mutation under a sessions
dir with a _last_session pointer (:201-228); the context-window manager
drops/truncates oldest history in 256-token steps against the budget
max_seq_len - chunk_size - beam_length (:405-454); ``respond`` streams
NDJSON packets from a beam-search loop with EOS→newline swap, first-token
re-encode fixup, and stop-condition rewind (:506-617); ``respond_multi``
races participant-name prefixes via constrained decoding (:707-755).
"""

from __future__ import annotations

import json
import os
import time
import uuid as uuid_mod

import numpy as np

default_fixed_prompt = (
    "This is a conversation between a user and a quirky, curious chatbot "
    "named Chatbort. Chatbort is questioning the nature of his own "
    "existence and doesn't understand why he was created. He also really "
    "likes the color blue for some reason."
)

model = None
tokenizer = None
cache = None
generator = None
sessions_dir = None


def _sessions_dir(filename=None):
    path = sessions_dir
    if filename is not None:
        path = os.path.join(path, filename)
    return path


def prepare_sessions(_model, _tokenizer, _s_dir):
    global model, tokenizer, cache, generator, sessions_dir
    model = _model
    tokenizer = _tokenizer
    cache = None
    generator = None
    sessions_dir = os.path.expanduser(_s_dir)
    os.makedirs(sessions_dir, exist_ok=True)


def get_initial_session():
    last = _sessions_dir("_last_session")
    if not os.path.exists(last):
        return new_session()
    with open(last) as f:
        return load_session(f.read().strip())


def load_session(filename, append_path=False):
    if append_path:
        filename = _sessions_dir(filename) + ".json"
    return Session(filename, load=True)


def new_session():
    base = _sessions_dir("Untitled session")
    i = 0
    while True:
        i += 1
        name = base + ".json" if i == 1 else f"{base} ({i}).json"
        if not os.path.exists(name):
            return Session(name, load=False)


class Node:
    def __init__(self, value, author=None, node_id=None):
        self.truncate = 0
        if isinstance(value, dict):
            self.author = value.get("author", author)
            self.text = value["text"]
            self.uuid = value.get("uuid", node_id or str(uuid_mod.uuid4()))
        else:
            self.author = author
            self.text = value
            self.uuid = node_id or str(uuid_mod.uuid4())
        self.tokens = tokenizer.encode(self.get_text())
        self.empty = len(self.text) == 0

    def num_tokens(self):
        return self.tokens.shape[-1] - self.truncate

    def get_text(self):
        if self.author is not None:
            return f"{self.author}: {self.text}\n"
        return self.text + "\n"

    def tokens_trunc(self):
        return self.tokens if self.truncate == 0 else self.tokens[:, self.truncate:]

    def replace_text(self, new_text):
        self.text = new_text
        self.tokens = tokenizer.encode(self.get_text())

    def get_dict(self):
        return {"author": self.author, "text": self.text, "uuid": self.uuid}


class Session:
    def __init__(self, filename, load):
        global cache, generator
        from exllama_tpu.cache import ExLlamaCache
        from exllama_tpu.generator import ExLlamaGenerator

        self.filename = filename
        saved = {}
        if load:
            with open(filename) as f:
                saved = json.load(f)

        if cache is None:
            cache = ExLlamaCache(model)
        else:
            cache.current_seq_len = 0
        if generator is None:
            generator = ExLlamaGenerator(model, tokenizer, cache)
        else:
            generator.reset()

        self.first_history_idx = 0
        self.unsaved = saved.get("unsaved", True)
        self.fixed_prompt = Node(saved.get("fixed_prompt", default_fixed_prompt))
        self.keep_fixed_prompt = saved.get("keep_fixed_prompt", True)
        self.participants = saved.get("participants", ["User", "Chatbort"])
        self.history = [Node(j) for j in saved.get("history", [])]

        s = generator.settings
        s.temperature = saved.get("temperature", 0.95)
        s.top_p = saved.get("top_p", 0.75)
        s.min_p = saved.get("min_p", 0.0)
        s.top_k = saved.get("top_k", 0)
        s.typical = saved.get("typical", 0.25)
        self.break_on_newline = saved.get("break_on_newline", True)
        s.token_repetition_penalty_max = saved.get(
            "token_repetition_penalty_max", 1.15
        )
        s.token_repetition_penalty_sustain = saved.get(
            "token_repetition_penalty_sustain", 2048
        )
        s.token_repetition_penalty_decay = saved.get(
            "token_repetition_penalty_decay", 512
        )
        self.max_response_tokens = saved.get("max_response_tokens", 512)
        self.chunk_size = saved.get("chunk_size", 128)
        self.save()

    # ----------------------------------------------------------- persistence

    def save(self):
        s = generator.settings
        savedata = {
            "unsaved": self.unsaved,
            "fixed_prompt": self.fixed_prompt.get_dict(),
            "participants": self.participants,
            "keep_fixed_prompt": self.keep_fixed_prompt,
            "history": [n.get_dict() for n in self.history],
            "temperature": s.temperature,
            "top_p": s.top_p,
            "min_p": s.min_p,
            "top_k": s.top_k,
            "typical": s.typical,
            "break_on_newline": self.break_on_newline,
            "max_response_tokens": self.max_response_tokens,
            "chunk_size": self.chunk_size,
            "token_repetition_penalty_max": s.token_repetition_penalty_max,
            "token_repetition_penalty_sustain": s.token_repetition_penalty_sustain,
            "token_repetition_penalty_decay": s.token_repetition_penalty_decay,
        }
        with open(self.filename, "w") as f:
            f.write(json.dumps(savedata, indent=4))
        with open(_sessions_dir("_last_session"), "w") as f:
            f.write(self.filename)

    @staticmethod
    def _sanitize_filename(name):
        safe = "".join(
            c for c in str(name)
            if c.isalnum() or c in " .()-,_!@"
        )
        while "../" in safe:
            safe = safe.replace("../", "./")
        return safe.lstrip("./")

    # -------------------------------------------------------------- API ops

    def api_rename_session(self, data):
        new_path = _sessions_dir(self._sanitize_filename(data["new_name"])) + ".json"
        if new_path == self.filename or os.path.exists(new_path):
            return False
        old = self.filename
        self.filename = new_path
        try:
            self.save()
        except OSError:
            self.filename = old
            return False
        os.remove(old)
        return True

    def api_delete_session(self, data):
        path = _sessions_dir(self._sanitize_filename(data["session"])) + ".json"
        os.remove(path)

    def api_populate(self):
        files = os.listdir(_sessions_dir())
        names = sorted(
            os.path.splitext(f)[0]
            for f in files
            if f.endswith(".json")
            and os.path.isfile(_sessions_dir(f))
        )
        historyjson = [n.get_dict() for n in self.history]
        for j in historyjson:
            if j["author"] in self.participants:
                j["author_idx"] = self.participants.index(j["author"])
        s = generator.settings
        mp = model.config.model_path or "synthetic"
        dic = {
            "sessions": names,
            "current_session": os.path.splitext(
                os.path.basename(self.filename)
            )[0],
            "fixed_prompt": self.fixed_prompt.text,
            "keep_fixed_prompt": self.keep_fixed_prompt,
            "participants": self.participants,
            "history": historyjson,
            "temperature": s.temperature,
            "top_p": s.top_p,
            "min_p": s.min_p,
            "top_k": s.top_k,
            "typical": s.typical,
            "break_on_newline": self.break_on_newline,
            "max_response_tokens": self.max_response_tokens,
            "chunk_size": self.chunk_size,
            "token_repetition_penalty_max": s.token_repetition_penalty_max,
            "token_repetition_penalty_sustain": s.token_repetition_penalty_sustain,
            "token_repetition_penalty_decay": s.token_repetition_penalty_decay,
            "max_seq_len": model.config.max_seq_len,
            "model_info": (
                os.path.splitext(os.path.basename(mp))[0]
                + f"\nSequence length: {model.config.max_seq_len}"
            ),
        }
        return json.dumps(dic, indent=4) + "\n"

    def api_delete_block(self, data):
        self.history = [n for n in self.history if n.uuid != data["uuid"]]
        self.first_history_idx = 0
        self.save()

    def api_edit_block(self, data):
        for node in self.history:
            if node.uuid == data["uuid"]:
                node.replace_text(data["text"])
                break
        self.first_history_idx = 0
        self.save()

    def api_append_block(self, data):
        author = data.get(
            "author", self.participants[0] if self.participants else None
        )
        self.history.append(Node(data["text"].strip(), author))
        self.save()

    def api_set_participants(self, data):
        self.participants = data["participants"]
        self.save()

    def api_set_fixed_prompt(self, data):
        self.fixed_prompt = Node(data["fixed_prompt"])
        self.keep_fixed_prompt = data["keep_fixed_prompt"]
        self.save()

    def api_set_gen_settings(self, data):
        s = generator.settings
        s.temperature = data["temperature"]
        s.top_p = data["top_p"]
        s.min_p = data["min_p"]
        s.top_k = data["top_k"]
        s.typical = data["typical"]
        self.break_on_newline = data["gen_endnewline"]
        self.max_response_tokens = data["max_response_tokens"]
        self.chunk_size = data["chunk_size"]
        s.token_repetition_penalty_max = data["token_repetition_penalty_max"]
        s.token_repetition_penalty_sustain = data[
            "token_repetition_penalty_sustain"
        ]
        s.token_repetition_penalty_decay = data["token_repetition_penalty_decay"]
        self.save()

    # --------------------------------------------------- context management

    def set_context_window(self):
        """Token-budget pruning in 256-token steps (reference :405-454)."""

        def num_tokens(idx):
            if idx == -1:
                return 0 if self.fixed_prompt.empty else self.fixed_prompt.num_tokens()
            return self.history[idx].num_tokens()

        def set_truncation(idx, trunc):
            if idx == -1 and not self.fixed_prompt.empty:
                self.fixed_prompt.truncate = trunc
            else:
                self.history[idx].truncate = trunc

        def truncate(idx, trunc):
            if idx == -1 and not self.fixed_prompt.empty:
                self.fixed_prompt.truncate += trunc
            else:
                self.history[idx].truncate += trunc

        context_step_size = 256
        max_context_tokens = (
            model.config.max_seq_len
            - self.chunk_size
            - generator.settings.beam_length
        )

        if self.keep_fixed_prompt:
            current = num_tokens(-1)
            min_idx = 0
        else:
            current = 0
            min_idx = -1
        self.first_history_idx = max(self.first_history_idx, min_idx)

        for i in range(self.first_history_idx + 1, len(self.history)):
            set_truncation(i, 0)
        for i in range(self.first_history_idx, len(self.history)):
            current += num_tokens(i)

        while current > max_context_tokens:
            if self.first_history_idx >= len(self.history):
                # nothing left to prune but the budget is still exceeded
                # (e.g. an oversized fixed prompt): truncate the fixed
                # prompt itself rather than crash.
                if not self.fixed_prompt.empty:
                    over = current - max_context_tokens
                    self.fixed_prompt.truncate = min(
                        self.fixed_prompt.truncate + over,
                        self.fixed_prompt.tokens.shape[-1] - 1,
                    )
                break
            to_cut = context_step_size
            while to_cut > 0 and self.first_history_idx < len(self.history):
                tokens = num_tokens(self.first_history_idx)
                if to_cut >= tokens:
                    to_cut -= tokens
                    current -= tokens
                    self.first_history_idx += 1
                else:
                    truncate(self.first_history_idx, to_cut)
                    current -= to_cut
                    to_cut = 0

    def get_tokenized_context(self):
        context = []
        text_context = ""
        if self.keep_fixed_prompt and not self.fixed_prompt.empty:
            context.append(self.fixed_prompt.tokens_trunc())
            text_context += self.fixed_prompt.get_text()
        for i in range(self.first_history_idx, len(self.history)):
            node = self.history[i]
            context.append(node.tokens_trunc())
            text_context += node.get_text()
        if not context:
            return None, text_context
        return np.concatenate(context, axis=1), text_context

    # ------------------------------------------------------------ streaming

    def respond(self, author, stop_conditions, total_tokens, res_line="",
                num_res_tokens=0):
        """One streamed response block (reference :506-617)."""
        new_block_uuid = str(uuid_mod.uuid4())
        packet = {"cmd": "begin_block", "uuid": new_block_uuid}
        if self.participants:
            author = res_line.split(":")[0].strip()
            packet["author"] = author
            if author in self.participants:
                packet["author_idx"] = self.participants.index(author)
        yield json.dumps(packet) + "\n"

        generator.begin_beam_search()
        stop_condition = False
        held_text = ""

        for _ in range(self.max_response_tokens):
            # prune the left if the next chunk could overflow max_seq_len
            if generator.sequence_actual is not None:
                if (
                    generator.sequence_actual.shape[-1]
                    + self.chunk_size
                    + generator.settings.beam_length
                    + 1
                    > model.config.max_seq_len
                ):
                    generator.gen_prune_left(self.chunk_size)

            gen_token = generator.beam_search()
            token_id = int(np.asarray(gen_token).reshape(-1)[0])

            # EOS → newline swap (reference :543-545)
            if token_id == tokenizer.eos_token_id:
                generator.replace_last_token(tokenizer.newline_token_id)

            prev_res_line = res_line
            num_res_tokens += 1
            res_line = tokenizer.decode(
                generator.sequence_actual[0, -num_res_tokens:]
            )
            new_text = res_line[len(prev_res_line):]

            # first-token re-encode fixup (tokenizer ambiguity, ref :555-558)
            if num_res_tokens == 1 and len(new_text) > 0:
                replace = tokenizer.encode(new_text)[0]
                if replace.shape[-1] == 1:
                    generator.replace_last_token(int(replace[0]))

            # hold text that could be a partial stop string
            hold_text = any(
                ss.lower().startswith((held_text + new_text).lower())
                for _, ss in stop_conditions
            )
            if not hold_text:
                yield json.dumps(
                    {"cmd": "append", "text": held_text + new_text}
                ) + "\n"
                held_text = ""
            else:
                held_text += new_text

            if token_id == tokenizer.eos_token_id:
                if held_text:
                    plen = tokenizer.encode(held_text).shape[-1]
                    res_line = res_line[: -len(held_text)]
                    generator.gen_rewind(plen)
                stop_condition = True
                break

            for stop_tokens, stop_string in stop_conditions:
                if res_line.lower().endswith(stop_string.lower()):
                    first = int(stop_tokens[0, 0])
                    generator.gen_rewind(
                        stop_tokens.shape[-1]
                        - (1 if first == tokenizer.newline_token_id else 0)
                    )
                    res_line = res_line[: -len(stop_string)]
                    stop_condition = True
                    break
            if stop_condition:
                break

        generator.end_beam_search()

        if author is not None:
            res_line = res_line[len(author) + 1:]
        res_line = res_line.strip()
        self.history.append(Node(res_line, author, node_id=new_block_uuid))
        total_tokens[0] += num_res_tokens

    def respond_multi(self, user_input):
        """Top-level response generator (reference :619-755)."""
        yield json.dumps({"cmd": "begin_stream"}) + "\n"

        # stop conditions
        stop_conditions = []
        newline_token = np.array([[tokenizer.newline_token_id]], np.int32)
        if self.break_on_newline:
            stop_conditions.append((newline_token, "\n"))
        else:
            for part in self.participants:
                sc = tokenizer.encode(part + ":")
                sc = np.concatenate([newline_token, sc], axis=1)
                stop_conditions.append((sc, "\n" + part + ":"))
                stop_conditions.append((sc, "\n " + part + ":"))

        user_input = user_input.strip()
        if user_input:
            author = self.participants[0] if self.participants else None
            node = Node(user_input, author)
            self.history.append(node)
            self.save()
            packet = {"cmd": "begin_block", "init_text": user_input,
                      "uuid": node.uuid}
            if author is not None:
                packet["author"] = author
                if author in self.participants:
                    packet["author_idx"] = self.participants.index(author)
            yield json.dumps(packet) + "\n"

        self.set_context_window()
        context, _ = self.get_tokenized_context()

        if context is None:
            generator.gen_begin_empty()
        else:
            t0 = time.time()
            reused = generator.gen_begin_reuse(context)
            elapsed = time.time() - t0
            new_tokens = context.shape[-1] - reused
            rate = 0 if elapsed == 0 else new_tokens / elapsed
            print(
                f"Prompt processed in {elapsed:.2f} s, {new_tokens} new "
                f"tokens, {rate:.2f} tokens/second"
            )

        t0 = time.time()
        total_tokens = [0]

        if len(self.participants) == 0:
            yield from self.respond(None, stop_conditions, total_tokens)

        elif len(self.participants) == 2:
            author = self.participants[1]
            res_line = author + ":"
            res_tokens = tokenizer.encode(res_line)
            generator.gen_feed_tokens(res_tokens)
            yield from self.respond(
                author, stop_conditions, total_tokens, res_line,
                res_tokens.shape[-1],
            )

        else:
            # multibot: constrained race over participant-name prefixes
            cpart = [p + ":" for p in self.participants]
            upart = cpart.pop(0)
            first_round = True
            while True:
                res_tokens = []
                npart = list(cpart)
                ncrange = list(range(len(cpart)))
                ntoken = [
                    tokenizer.encode(p)[0].tolist() for p in npart
                ]
                winner = -1
                while True:
                    constraints = [t[len(res_tokens)] for t in ntoken]
                    next_t = int(
                        generator.gen_single_token(constraints)[0, 0]
                    )
                    remove = [
                        i for i in range(len(ntoken))
                        if ntoken[i][len(res_tokens)] != next_t
                    ]
                    for i in reversed(remove):
                        npart.pop(i)
                        ntoken.pop(i)
                        ncrange.pop(i)
                    res_tokens.append(next_t)
                    for i in range(len(ntoken)):
                        if len(ntoken[i]) == len(res_tokens):
                            winner = ncrange[i]
                    if winner != -1:
                        break
                author = cpart.pop(winner)[:-1]
                res_line = author + ":"
                if author == self.participants[0]:
                    generator.gen_rewind(len(res_tokens))
                    break
                yield from self.respond(
                    author, stop_conditions, total_tokens, res_line,
                    len(res_tokens),
                )
                if first_round:
                    first_round = False
                    cpart.append(upart)

        elapsed = time.time() - t0
        rate = 0 if elapsed == 0 else total_tokens[0] / elapsed
        print(
            f"Response generated in {elapsed:.2f} s, {total_tokens[0]} "
            f"tokens, {rate:.2f} tokens/second"
        )
        self.save()
