-- Stream workflow: six declared stdin flowws drive the kit + two
-- wavetable synths; no fixed MIDI, events arrive live as packets
-- (pipe send_events.py in). Port of /root/reference/examples/stream.lua;
-- assets generated on first run (make_assets.py).

load_sample("snare", "../assets/snare_damped.wav", "mix-down");
load_sample("kick", "../assets/kick.wav", "mix-down");
load_sample("hihat", "../assets/hihat_tight.wav", "normalize-seperate");
load_sample("ride", "../assets/ride.wav", "normalize-seperate");

load_resource("comp-table", "../assets/hollowbody.wt");
load_resource("bass-table", "../assets/nylon.wt");

declare_stream("ride");
declare_stream("hihat");
declare_stream("kick");
declare_stream("snare");
declare_stream("chords");
declare_stream("bass");

add_sample_lerp("kick", 1.0, 0.0, "kick", "kick", -1, 40);
add_sample_lerp("snare", 1.0, 0.0, "snare", "snare", -1, 40);
add_sample_lerp("hihat", 3.0, 20.0, "hihat", "hihat", -1, 40);
add_sample_lerp("ride", 1.0, -20.0, "ride", "ride", -1, 40);

note_adsr = { 0.01, 0.1, 0.8, 5.0, 0.2, 0.5 };
add_sampsyn("comping", 0.8, 0.0, "chords", note_adsr, "comp-table");

bass_adsr = { 0.01, 2.0, 1.0, 5.0, 0.0, 0.05 };
add_sampsyn("bass", 2.0, 0.0, "bass", bass_adsr, "bass-table");

add_normalize("sum", 0.7, 0.0);

connect("kick", "sum");
connect("snare", "sum");
connect("hihat", "sum");
connect("ride", "sum");
connect("comping", "sum");
connect("bass", "sum");

set_output("sum");
