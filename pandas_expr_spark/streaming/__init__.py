from .stream import (read_stream, session_window_agg, sliding_window_agg,
                     stateful_running_agg, stateful_running_agg_tws,
                     stateful_stream_dedup, stateful_stream_dedup_tws,
                     stream_stream_join, to_memory_sink, tumbling_window_agg,
                     write_stream)

__all__ = ["read_stream", "tumbling_window_agg", "sliding_window_agg",
           "session_window_agg", "stream_stream_join",
           "stateful_running_agg",
           "stateful_running_agg_tws", "stateful_stream_dedup",
           "stateful_stream_dedup_tws", "write_stream", "to_memory_sink"]
