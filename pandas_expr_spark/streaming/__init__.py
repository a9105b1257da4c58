from .stream import (read_stream, session_window_agg, sliding_window_agg,
                     stateful_running_agg, to_memory_sink, tumbling_window_agg,
                     write_stream)

__all__ = ["read_stream", "tumbling_window_agg", "sliding_window_agg",
           "session_window_agg", "stateful_running_agg", "write_stream",
           "to_memory_sink"]
